"""starbelly_spark — a PySpark-native streaming crawl engine.

A from-scratch reimplementation of the capabilities of
HyperionGray/starbelly (policy-driven web crawler) as idiomatic
PySpark: the URL frontier is a window-ranked priority queue over
partitioned tables, the URL-seen set is a partitioned blocked-bloom +
cuckoo filter, robots/politeness are broadcast-joined rule tables, and
the fetch/decode path is vectorized Arrow UDFs.

Reference semantics are documented in SURVEY.md with file:line
citations into /root/reference; no code was copied from the reference.
"""

__version__ = "0.1.0"
