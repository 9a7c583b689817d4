"""Sources: the record-decode edge of the reference pipeline (R1-R5).

The only place Python UDFs are allowed in this engine (SURVEY.md §2B "UDF
policy"): gzip decompression and pre-signed-URL dereferencing have no
builtin equivalents. Both are Arrow-vectorized pandas UDFs.
"""
