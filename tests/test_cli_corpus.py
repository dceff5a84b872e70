"""The `corpus` CLI subcommand drives jobs.build_training_corpus end to
end and prints the per-stage counts."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from binance_data_pipeline_spark.__main__ import main


def test_cli_corpus_build(spark, tmp_path, capsys):
    src = str(tmp_path / "docs.parquet")
    rows = [
        (1, "the quick brown fox jumps over the lazy dog by the river", "en"),
        (2, "the quick brown fox jumps over the lazy dog by the river", "en"),  # dup
        (3, "completely different text about mountains and weather patterns", "en"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(src)
    out = str(tmp_path / "corpus")

    rc = main([
        "corpus", "--docs", src, "--out", out,
        "--min-quality", "0.0", "--dedup-threshold", "0.9",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "input=3" in printed and "exported=2" in printed
    assert spark.read.parquet(f"{out}/corpus.parquet").count() == 2
    assert spark.read.parquet(f"{out}/mapping.parquet").count() >= 1
