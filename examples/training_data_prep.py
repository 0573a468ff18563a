"""Training-data preparation as a library: the north-star operator
surface chained the way a pretraining pipeline would use it.

Every step is a registered engine operator (motorway_spark.queries) —
quality filtering, exact + fuzzy dedup with canonical cluster
resolution, contamination screening, stratified splitting, sequence
packing — each one oracle-verified against DuckDB at three scale
factors. This example runs the composite ``pipeline_pretraining_mix``
(quality → dedup → class cap → split → pack) plus the corpus-hygiene
report, over the documents fixture.

Run: ``python examples/training_data_prep.py [sf_dir]``
"""

from __future__ import annotations

# allow "python examples/<name>.py" from a source checkout without install
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

from motorway_spark.queries import QUERIES
from motorway_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("example-training-prep")

    print("== corpus hygiene ==")
    for name in (
        "dedup_exact",
        "dedup_url_canonical",
        "decontam_ngram_overlap",
        "dedup_chunk_global",
        "dedup_semantic_semdedup",
    ):
        df = QUERIES[name](spark, sf_dir)
        print(f"{name}: {df.count()} rows")

    print("== vector-column QA ==")
    QUERIES["embedding_quality_stats"](spark, sf_dir).show(truncate=False)

    print("== pretraining mix (quality -> dedup -> cap -> split -> pack) ==")
    QUERIES["pipeline_pretraining_mix"](spark, sf_dir).show(truncate=False)

    print("== corpus curation (gates -> semantic dedup -> token budget) ==")
    QUERIES["pipeline_corpus_curation"](spark, sf_dir).show(truncate=False)

    print("== importance-weighted sampling (expected vs actual) ==")
    QUERIES["sample_importance_weighted"](spark, sf_dir).show(truncate=False)


if __name__ == "__main__":
    main()
