"""Engine-agnostic function builders shared by queries and their oracles."""

from kinesis_customer_sample_spark.functions.porthash import (  # noqa: F401
    MOD_P,
    band_hash_expr,
    cosine_expr,
    minhash_perm_expr,
    tok_hash_expr,
)
