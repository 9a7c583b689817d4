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

from kinesis_customer_sample_spark.queries import (  # noqa: F401
    aggregation,
    content_ops,
    dedup,
    flagship,
    functions_scalar,
    multimodal,
    pipeline_ops,
    relational,
    scale_patterns,
    setops,
    similarity,
    sources_scan,
    streaming_queries,
    text_analysis,
    windows,
)
