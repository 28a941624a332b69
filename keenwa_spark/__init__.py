"""keenwa_spark — a PySpark-native analytics engine with the query
capabilities of the keenwa cost-based optimizer (reference:
/root/reference, Rust), re-expressed Spark-first.

Keenwa plans SQL SELECT queries over catalog-declared relational tables
(reference src/sql/mod.rs, src/operators/relational/logical/mod.rs:38-67)
but never executes them. Here, Catalyst plays the role of keenwa's
Cascades search (reference src/optimizer.rs); this package provides:

- ``Engine``       — SQL entry point + table registry (engine.py)
- ``Catalog``      — parquet-backed tables with row-count statistics,
                     mirroring reference src/catalog/mod.rs
- ``PlanBuilder``  — fluent logical-plan builder mirroring keenwa's
                     OperatorBuilder (reference src/operators/builder/mod.rs)
- ``dialect``      — the supported/rejected SQL surface matrix
                     (reference src/sql/mod.rs:102-144 et al.)
- ``pipeline``     — beyond-reference LLM-data-pipeline operators
                     (dedup, similarity search, text analysis, multimodal)
"""

from keenwa_spark.builder import PlanBuilder
from keenwa_spark.catalog import Catalog, TableDef
from keenwa_spark.engine import Engine
from keenwa_spark.errors import (
    ArgumentError,
    KeenwaSparkError,
    NotSupportedError,
    TypeCheckError,
)
from keenwa_spark.plans import assert_scale_shape, explain_text, summarize
from keenwa_spark.session import get_spark

__all__ = [
    "ArgumentError",
    "Catalog",
    "Engine",
    "KeenwaSparkError",
    "NotSupportedError",
    "PlanBuilder",
    "TableDef",
    "TypeCheckError",
    "assert_scale_shape",
    "explain_text",
    "get_spark",
    "summarize",
]

__version__ = "0.1.0"
