"""Reusable operator implementations the DataFrame API lacks natively.

Each operator is a composition of built-in Spark ops chosen for 100 TB scale
(no cross-join explosions, no driver-side loops); Pandas-UDF fallbacks exist
only where composition genuinely can't express the semantics.
"""
