"""Query modules. Importing this package registers every named query.

Module map (mirrors SURVEY.md §2B groups):
- flagship        — the entry() pricing-summary query (M0)
- relational      — projection / filter / conditional / join family (M1)
- aggregation     — group-by, distinct, rollup/cube, filtered, stats (M1)
- windows         — ranking / analytic / frames / latest-state (M1)
- setops          — sort, limit, top-k, union/intersect/except (M1)
- functions_scalar— string/date/math/array/json/null/hash families (M2)
- content_ops     — reference pipeline semantics, batch form (M3, guide:58-145)
- llm_text        — tokenize, TF-IDF, language stats, quality, lexicon (M5)
- llm_dedup       — exact / ngram-jaccard / minhash-LSH / simhash dedup (M5)
- llm_similarity  — cosine, top-k ANN, all-pairs, kNN vote, multimodal (M5)
"""

# Import order IS driver-visit order (the registry is an insertion-ordered
# dict, and the round-1 driver walked it front-to-back and stopped after 50
# entries). Families with no driver-green row yet register FIRST so a
# count- or time-capped harness reaches them this round; the families that
# went green in round 1 re-verify at the tail. Dependency constraints:
# streaming_queries imports content_ops; dedup imports text_analysis;
# pipeline_ops imports dedup.
from kinesis_customer_sample_spark.queries import (  # noqa: F401
    relational,
    windows,
    setops,
    scale_patterns,
    sources_scan,
    similarity,
    content_ops,
    streaming_queries,
    aggregation,
    text_analysis,
    dedup,
    flagship,
    functions_scalar,
    multimodal,
    pipeline_ops,
    composites2,
    composites3,
    composites4,
)
