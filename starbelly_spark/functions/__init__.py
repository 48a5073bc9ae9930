"""Scalar / vectorized functions (the crawl engine's UDF surface).

Everything here is either a pure-Python function (unit-testable
without Spark) plus a vectorized pandas-UDF wrapper, or a Spark
Column-expression builder.  No row-at-a-time Python UDFs.
"""
