"""Auxiliary sources (SURVEY.md §2 S6/S7).

* parameter-sheet scan — CSV with normalized headers → broadcast
  dimension joined to the spec table (main.py:94-122 + the J1 spec
  lookup with its extraction_failed miss branch, crif.py:56-65)
* knowledge-base scan — see ops/rag.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .specs import PARAMETER_SPECS


def read_parameter_sheet(spark: SparkSession, path: str) -> DataFrame:
    """CSV scan with the reference's header normalization
    (main.py:106: lower().strip()); expects columns
    'Parameter ID', 'Parameter Name', 'Description' in any casing.
    (The reference also accepts Excel via pandas; xlsx decode is out of
    scope in this container — CSV twin files ship with the reference.)
    """
    df = spark.read.option("header", True).csv(path)
    renames = {c: c.lower().strip() for c in df.columns}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df.select(
        F.coalesce(F.col("`parameter id`"), F.lit("")).alias("id"),
        F.coalesce(F.col("`parameter name`"), F.lit("")).alias("name"),
        F.coalesce(F.col("`description`"), F.lit("")).alias("description"))


def specs_dataframe(spark: SparkSession) -> DataFrame:
    """The PARAMETER_SPECS dimension (parameter_specs.py:44-180) as a
    broadcastable DataFrame."""
    return spark.createDataFrame(
        PARAMETER_SPECS,
        schema=("param_id string, name string, description string, "
                "expected_type string, category string, validator string"))


def params_with_specs(params: DataFrame, specs: DataFrame) -> DataFrame:
    """J1 — broadcast LEFT join; a missing spec marks the parameter
    extraction_failed (crif.py:56-65)."""
    joined = params.join(F.broadcast(specs),
                         params["id"] == specs["param_id"], "left")
    return joined.select(
        params["id"].alias("param_id"),
        params["name"], params["description"],
        specs["category"], specs["expected_type"], specs["validator"],
        F.when(specs["param_id"].isNull(), F.lit("extraction_failed"))
        .otherwise(F.lit("ok")).alias("spec_status"))
