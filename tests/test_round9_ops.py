"""Round-9 query-level tests: corpus_shift_by_source invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_corpus_shift_zero_for_single_source(spark, tmp_path):
    """With one source, the per-source histogram IS the corpus
    reference — chi2 must be exactly 0.0 (pure IEEE arithmetic on
    identical ratios, no tolerance needed)."""
    import pandas as pd

    from ballista_extensions_spark.queries.analytics6 import (
        corpus_shift_by_source,
    )

    df = pd.DataFrame(
        {
            "doc_id": range(50),
            "source": ["web"] * 50,
            "text": ["x" * (37 * (i % 40)) for i in range(50)],
            "lang": ["en"] * 50,
            "n_chars": [37 * (i % 40) for i in range(50)],
        }
    )
    p = str(tmp_path / "documents.parquet")
    df.to_parquet(p)
    rows = corpus_shift_by_source(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].n_docs == 50
    assert rows[0].chi2 == 0.0


def test_corpus_shift_flags_shifted_source(spark, sf_dir):
    """On real driver data every source gets a finite non-negative
    chi2 and doc counts partition the corpus."""
    from ballista_extensions_spark.io import load_table
    from ballista_extensions_spark.queries.analytics6 import (
        corpus_shift_by_source,
    )

    rows = corpus_shift_by_source(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    assert all(r.chi2 >= 0.0 for r in rows)
