"""The reference function inventory with Spark mappings and signatures.

Sources (complete lists, not samples):
- aggregates ``avg count max min sum``:
  reference src/operators/scalar/aggregates.rs:10-16, signatures :25-43
- window functions ``row_number rank first_value last_value`` (plus any
  aggregate): reference aggregates.rs:75-96, :126-129
- scalar string functions ``bit_length character_length concat lower
  position to_hex replace upper``: reference src/operators/scalar/
  funcs.rs:9-18, signatures :38-47

Signature notes mirrored from the reference:
- count returns Int32 there, BIGINT here (Spark-native; cast at the
  presentation boundary when Int32 parity is required — SURVEY §2c);
- the reference declares Replace with 2 string args (funcs.rs:45, a
  quirk); standard 3-arg REPLACE is implemented, divergence documented;
- everything beyond this inventory (math/date/array/map/JSON, UDFs) is
  TODO in the reference (README.md:139-145) and present natively in
  Spark — a strict superset.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class FuncSpec:
    """One function: reference name, arg types, return type, Spark SQL
    template ({0}, {1}, ... are argument slots)."""

    name: str
    arg_types: tuple[str, ...]
    return_type: str
    spark_template: str
    ref: str  # reference file:line
    note: str = ""


AGGREGATE_FUNCTIONS: dict[str, FuncSpec] = {
    f.name: f
    for f in [
        FuncSpec("avg", ("numeric",), "double", "avg({0})", "aggregates.rs:26"),
        FuncSpec(
            "count", ("any",), "bigint", "count({0})", "aggregates.rs:29",
            note="reference returns int32; Spark bigint (cast at boundary for parity)",
        ),
        FuncSpec("max", ("comparable",), "mirror", "max({0})", "aggregates.rs:33"),
        FuncSpec("min", ("comparable",), "mirror", "min({0})", "aggregates.rs:36"),
        FuncSpec("sum", ("numeric",), "widened", "sum({0})", "aggregates.rs:39"),
    ]
}

WINDOW_FUNCTIONS: dict[str, FuncSpec] = {
    f.name: f
    for f in [
        FuncSpec("row_number", (), "bigint", "row_number()", "aggregates.rs:78"),
        FuncSpec("rank", (), "bigint", "rank()", "aggregates.rs:81"),
        FuncSpec("first_value", ("any",), "mirror", "first_value({0})", "aggregates.rs:84"),
        FuncSpec("last_value", ("any",), "mirror", "last_value({0})", "aggregates.rs:87"),
    ]
}

SCALAR_FUNCTIONS: dict[str, FuncSpec] = {
    f.name: f
    for f in [
        FuncSpec("bit_length", ("string",), "int", "bit_length({0})", "funcs.rs:10"),
        FuncSpec(
            "character_length", ("string",), "int", "char_length({0})", "funcs.rs:11"
        ),
        FuncSpec("concat", ("string", "..."), "string", "concat({0})", "funcs.rs:12"),
        FuncSpec("lower", ("string",), "string", "lower({0})", "funcs.rs:13"),
        FuncSpec("position", ("string", "string"), "int", "position({0} IN {1})", "funcs.rs:14"),
        FuncSpec("to_hex", ("int",), "string", "hex({0})", "funcs.rs:15"),
        FuncSpec(
            "replace", ("string", "string", "string"), "string",
            "replace({0}, {1}, {2})", "funcs.rs:45",
            note="reference declares 2-arg (quirk); standard 3-arg implemented",
        ),
        FuncSpec("upper", ("string",), "string", "upper({0})", "funcs.rs:17"),
    ]
}


def spark_expr_for(name: str, *args: str) -> str:
    """Spark SQL text for a reference function call.

    >>> spark_expr_for("position", "'#'", "c_name")
    "position('#' IN c_name)"
    """
    for table in (SCALAR_FUNCTIONS, AGGREGATE_FUNCTIONS, WINDOW_FUNCTIONS):
        if name in table:
            spec = table[name]
            if spec.name == "concat":
                return f"concat({', '.join(args)})"
            return spec.spark_template.format(*args)
    raise KeyError(f"unknown function: {name!r}")


def register_udf(spark: SparkSession, name: str, fn, return_type: str = "string"):
    """User-defined scalar function registration — the surface the
    reference lists as TODO (README.md:165). Thin passthrough to
    spark.udf.register; prefer pandas_udf for hot paths (row-at-a-time
    Python UDFs serialize per row)."""
    return spark.udf.register(name, fn, return_type)
