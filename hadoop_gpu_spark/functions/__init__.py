"""Scalar/columnar function library (JVM-side expressions, no Python UDFs).

The reference ships no scalar-function library — all scalar work happens in
user map/reduce code (SURVEY.md §2.8). Here the needed subset is provided as
composable Column expressions so everything stays inside whole-stage codegen.
"""
