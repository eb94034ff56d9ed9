"""Deterministic healthcare-shaped frame derived from the ``orders`` fixture.

The reference's transforms/quality rules key on healthcare field names
(FIXTURES.md §B). The driver only ships TPC-H-ish tables, so operator
queries derive a healthcare frame from ``orders`` with modulo-keyed dirty
value injection — duplicates, invalid patient ids, mixed date formats,
out-of-range vitals, sentinel nulls, stray whitespace.

Two renderings that MUST stay value-identical:

* :func:`healthcare_frame` — Spark DataFrame (what the engine processes);
* :data:`HEALTHCARE_CTE` — DuckDB CTE producing the same rows (what the
  oracle SQL builds on).

Injection rates (per orderkey ``k``):
  id duplicates      k % 97 == 0          (whole row repeated)
  patient_id         NULL @ k%11==0, 'bad id!' @ k%7==0, else MRN#########
  birth_date         'junk-date' @ k%13==0, else ISO / MM/dd/yyyy /
                     dd/MM/yyyy / yyyyMMdd cycling on k%4
  admission_date     MM/dd/yyyy @ k%17==0 (fails ISO regex), else ISO
  discharge_date     admission - 3 days @ k%19==0 (cross-field
                     consistency violation), NULL @ k%21==0, else
                     admission + (k%10) days, always ISO
  age                200.0 @ k%9==0 (out of range), NULL @ k%23==0,
                     else 10..99
  heart_rate         500.0 @ k%29==0 (out of range), else 60..149
  diagnosis_code     'XX' @ k%31==0 (invalid), 'e11.9 ' @ k%5==0
                     (lowercase+pad: uppercase_codes target), else A##
  patient_name (PHI) populated @ k%2==0
  ssn (PHI)          '  123-45-6789  ' (whitespace for trim) @ k%3==0
  address            'N/A' sentinel everywhere (null_handling target)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_data_lakehouse_spark.tables import table

__all__ = ["healthcare_frame", "HEALTHCARE_CTE"]


def healthcare_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the dirty healthcare frame (see module docstring)."""
    orders = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    d = F.col("o_orderdate").cast("date").cast("string")

    mmddyyyy = F.concat(
        d.substr(6, 2), F.lit("/"), d.substr(9, 2), F.lit("/"), d.substr(1, 4)
    )
    ddmmyyyy = F.concat(
        d.substr(9, 2), F.lit("/"), d.substr(6, 2), F.lit("/"), d.substr(1, 4)
    )
    yyyymmdd = F.concat(d.substr(1, 4), d.substr(6, 2), d.substr(9, 2))

    rec = orders.select(
        k.alias("k"),
        k.cast("string").alias("id"),
        F.when(k % 11 == 0, F.lit(None).cast("string"))
        .when(k % 7 == 0, F.lit("bad id!"))
        .otherwise(F.concat(F.lit("MRN"), F.lpad(k.cast("string"), 9, "0")))
        .alias("patient_id"),
        F.when(k % 13 == 0, F.lit("junk-date"))
        .when(k % 4 == 0, d)
        .when(k % 4 == 1, mmddyyyy)
        .when(k % 4 == 2, ddmmyyyy)
        .otherwise(yyyymmdd)
        .alias("birth_date"),
        F.when(k % 17 == 0, mmddyyyy).otherwise(d).alias("admission_date"),
        F.when(
            k % 19 == 0,
            F.date_format(
                F.date_sub(F.col("o_orderdate").cast("date"), 3), "yyyy-MM-dd"
            ),
        )
        .when(k % 21 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.date_format(
                F.date_add(F.col("o_orderdate").cast("date"), (k % 10).cast("int")),
                "yyyy-MM-dd",
            )
        )
        .alias("discharge_date"),
        F.when(k % 9 == 0, F.lit(200.0))
        .when(k % 23 == 0, F.lit(None).cast("double"))
        .otherwise(((k * 7) % 90 + 10).cast("double"))
        .alias("age"),
        F.when(k % 29 == 0, F.lit(500.0))
        .otherwise((60 + k % 90).cast("double"))
        .alias("heart_rate"),
        F.when(k % 31 == 0, F.lit("XX"))
        .when(k % 5 == 0, F.lit("e11.9 "))
        .otherwise(F.concat(F.lit("A"), F.lpad((k % 100).cast("string"), 2, "0")))
        .alias("diagnosis_code"),
        F.when(k % 2 == 0, F.concat(F.lit("Patient "), k.cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("patient_name"),
        F.when(k % 3 == 0, F.lit("  123-45-6789  "))
        .otherwise(F.lit(None).cast("string"))
        .alias("ssn"),
        F.lit("N/A").alias("address"),
    )
    dups = rec.filter(F.col("k") % 97 == 0)
    return rec.unionAll(dups).drop("k")


#: DuckDB CTE producing rows identical to :func:`healthcare_frame`.
#: Embed as ``f"WITH {HEALTHCARE_CTE} SELECT ..."``.
HEALTHCARE_CTE = """
base AS (
  SELECT o_orderkey AS k,
         CAST(o_orderkey AS VARCHAR) AS id,
         substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 10) AS d
  FROM orders
),
rec0 AS (
  SELECT k, id,
    CASE WHEN k % 11 = 0 THEN NULL
         WHEN k % 7 = 0 THEN 'bad id!'
         ELSE 'MRN' || lpad(CAST(k AS VARCHAR), 9, '0') END AS patient_id,
    CASE WHEN k % 13 = 0 THEN 'junk-date'
         WHEN k % 4 = 0 THEN d
         WHEN k % 4 = 1 THEN substr(d,6,2) || '/' || substr(d,9,2) || '/' || substr(d,1,4)
         WHEN k % 4 = 2 THEN substr(d,9,2) || '/' || substr(d,6,2) || '/' || substr(d,1,4)
         ELSE substr(d,1,4) || substr(d,6,2) || substr(d,9,2) END AS birth_date,
    CASE WHEN k % 17 = 0
         THEN substr(d,6,2) || '/' || substr(d,9,2) || '/' || substr(d,1,4)
         ELSE d END AS admission_date,
    CASE WHEN k % 19 = 0 THEN CAST(CAST(d AS DATE) - 3 AS VARCHAR)
         WHEN k % 21 = 0 THEN NULL
         ELSE CAST(CAST(d AS DATE) + CAST(k % 10 AS INTEGER) AS VARCHAR)
         END AS discharge_date,
    CASE WHEN k % 9 = 0 THEN 200.0
         WHEN k % 23 = 0 THEN NULL
         ELSE CAST((k * 7) % 90 + 10 AS DOUBLE) END AS age,
    CASE WHEN k % 29 = 0 THEN 500.0
         ELSE CAST(60 + k % 90 AS DOUBLE) END AS heart_rate,
    CASE WHEN k % 31 = 0 THEN 'XX'
         WHEN k % 5 = 0 THEN 'e11.9 '
         ELSE 'A' || lpad(CAST(k % 100 AS VARCHAR), 2, '0') END AS diagnosis_code,
    CASE WHEN k % 2 = 0 THEN 'Patient ' || CAST(k AS VARCHAR) ELSE NULL END AS patient_name,
    CASE WHEN k % 3 = 0 THEN '  123-45-6789  ' ELSE NULL END AS ssn,
    'N/A' AS address
  FROM base
),
records AS (
  SELECT * EXCLUDE (k) FROM rec0
  UNION ALL
  SELECT * EXCLUDE (k) FROM rec0 WHERE k % 97 = 0
)
"""
