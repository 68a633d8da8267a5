"""LLM training-data curation on utils_spark: the north-star pipeline.

Run: python examples/llm_curation.py  (expects /root/testdata/sf0.001)

Walks the curation surface end-to-end on the `documents` /
`embeddings` tables: cleaning, quality gates, exact + near dedup,
similarity search, packing, and the one-query funnel. Every step shown
here is a registered driver query with a DuckDB oracle twin (QUERIES.md),
so the outputs below are cross-engine verified at three scale factors.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from utils_spark import get_spark
from utils_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="llm_curation_example", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    def show(name: str, n: int = 5) -> None:
        print(f"\n=== {name} — {reg[name].doc.strip().splitlines()[0]}")
        reg[name].fn(spark, SF).show(n, truncate=90)

    # 1. cleaning: rule-based boilerplate removal (map-only, zero UDF) +
    #    data-driven line-level dedup (corpus-wide line df threshold)
    show("boilerplate_strip")
    show("line_level_dedup")
    # 2. quality gates: heuristics, entropy proxy, and a REAL bigram-LM
    #    perplexity filter trained on the in-domain subset
    show("quality_score")
    show("char_entropy_filter")
    show("lm_perplexity_filter")
    # 3. language ID (trigram profiles, broadcast scoring join)
    show("lang_id_ngram")
    # 4. exact + near dedup (hash groupBy; MinHash+LSH banding — never n²)
    show("doc_fingerprint")
    show("minhash_lsh_pairs")
    # 5. canonical-doc selection per duplicate cluster (LSH-verified
    #    candidate pairs — corpus-scale, no doc cap), SemDeDup semantic
    #    dedup over embeddings, and the between-crawls incremental mode
    show("dedup_keep_best")
    show("semantic_dedup_keep")
    show("incremental_dedup_batch")
    # 6. learned quality gate (seed-trained classifier, broadcast-model
    #    map-only corpus scoring)
    show("quality_classifier_filter")
    # 7. similarity search over embeddings (broadcast queries; IVF scale path)
    show("cosine_topk")
    # 8. retrieval + targeted selection (BM25 scoring; DSIR importance weights)
    show("bm25_retrieval")
    show("importance_weights_dsir")
    # 9. decontamination vs a benchmark split + corpus mixing
    show("benchmark_decontamination")
    show("corpus_mixture_sample")
    # 10. tokenizer support: vocabulary coverage, BPE merge training
    #     round, and sequence packing
    show("vocab_coverage")
    show("bpe_merge_candidates")
    show("sequence_packing")
    # 11. the whole funnel as ONE cross-engine-proved query...
    show("curation_pipeline", n=10)
    # 12. ...and its INCREMENTAL (streaming) twin — quality gate + dedup
    #     state over a live document stream
    show("stream_curation_funnel")
    # 13. the published datasheet: per-source volume / language / dup /
    #     quality summary
    show("corpus_datasheet")

    spark.stop()


if __name__ == "__main__":
    main()
