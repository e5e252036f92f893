"""Scalar column-function surface (SURVEY.md §2.7 F1–F22 + extensions).

Everything here returns Column expressions built from
``pyspark.sql.functions`` so plans stay inside whole-stage codegen.
"""
