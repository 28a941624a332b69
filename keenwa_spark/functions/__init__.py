"""Function registry — the reference's function surface, mapped.

keenwa's registry machinery (signatures with exact/one-of/variadic args,
mirror return types, volatility — reference src/operators/scalar/
func.rs:10-70) is Catalyst's FunctionRegistry here; this module keeps
the PARITY ARTIFACT: the complete inventory of functions the reference
can plan, each mapped to its Spark implementation, plus the UDF
registration path the reference only lists as TODO (README.md:117,165).
"""

from keenwa_spark.functions.registry import (
    AGGREGATE_FUNCTIONS,
    SCALAR_FUNCTIONS,
    WINDOW_FUNCTIONS,
    register_udf,
    spark_expr_for,
)

__all__ = [
    "AGGREGATE_FUNCTIONS",
    "SCALAR_FUNCTIONS",
    "WINDOW_FUNCTIONS",
    "register_udf",
    "spark_expr_for",
]
