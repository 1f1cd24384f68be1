"""Semantics tests for operators whose oracle is omitted or indirect:
derivation dialect parity, MinHash recall vs exact Jaccard, SimHash
Hamming property, language ID, multimodal plumbing."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from janet_spark.derive import DUCKDB_TRANSCRIPTS_SQL, derived_transcripts
from janet_spark.queries_text import (
    _JACCARD_THRESHOLD,
    _doc_shingles,
    _MH_BANDS,
    _MH_ROWS,
    _minhash_signature,
)
from janet_spark.textops import detect_lang

SF = "/root/testdata/sf0.001"


def test_transcript_derivation_dialect_parity(spark):
    """The Spark and DuckDB renderings of the derivation spec must emit
    identical rows — this is what makes the transcript oracles valid."""
    sdf = (
        derived_transcripts(spark, SF)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    odf = (
        con.sql(DUCKDB_TRANSCRIPTS_SQL)
        .df()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(sdf) == len(odf)
    for col in ["conv_id", "turn_idx", "role", "text", "tool"]:
        assert sdf[col].astype(str).tolist() == odf[col].astype(str).tolist(), col
    assert (
        pd.to_datetime(sdf["ts"]).astype(str).tolist()
        == pd.to_datetime(odf["ts"]).astype(str).tolist()
    )


def _exact_jaccard(a: str, b: str) -> float:
    sa, sb = set(_doc_shingles(a)), set(_doc_shingles(b))
    return len(sa & sb) / len(sa | sb)


def test_minhash_band_recall_on_neardups():
    """Pairs above the Jaccard threshold must share at least one LSH band
    (candidate recall); the planted near-dups in `documents` are the case
    that matters at scale."""
    con = duckdb.connect()
    docs = con.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").df()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    sigs = {d: _minhash_signature(_doc_shingles(t)) for d, t in texts.items()}

    def bands(sig):
        return {
            (b, tuple(sig[b * _MH_ROWS : (b + 1) * _MH_ROWS])) for b in range(_MH_BANDS)
        }

    # find all truly-above-threshold pairs via an exact shingle join
    found_above = 0
    sh_to_docs: dict[str, list[int]] = {}
    for d, txt in texts.items():
        for s in _doc_shingles(txt):
            sh_to_docs.setdefault(s, []).append(d)
    candidates = set()
    for docs_with in sh_to_docs.values():
        if len(docs_with) > 1:
            ds = sorted(set(docs_with))
            for i, a in enumerate(ds):
                for b in ds[i + 1 :]:
                    candidates.add((a, b))
    high = [
        (a, b)
        for a, b in candidates
        if _exact_jaccard(texts[a], texts[b]) >= _JACCARD_THRESHOLD
    ]
    assert high, "test data must contain planted near-dups"
    for a, b in high:
        assert bands(sigs[a]) & bands(sigs[b]), (a, b)
        found_above += 1
    assert found_above >= 10


def test_simhash_hamming_property():
    from janet_spark.queries_text import q_simhash  # noqa: F401 (import check)

    # near-identical texts must be close in Hamming distance; unrelated far
    def simhash64(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in set(text.split(" ")):
            import zlib

            h = zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32)
            bits = np.unpackbits(
                np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8)
            ).astype(np.int64)
            acc += bits * 2 - 1
        return int.from_bytes(
            np.packbits((acc > 0).astype(np.uint8)).tobytes(), "big", signed=True
        )

    base = "the quick brown fox jumps over the lazy dog near the river bank " * 4
    near = base.replace("river", "stream")
    far = "completely different words about spark shuffle partitions and arrow batches"

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(simhash64(base), simhash64(near)) <= 12
    assert ham(simhash64(base), simhash64(far)) >= 20


@pytest.mark.parametrize(
    ("text", "lang"),
    [
        ("the cat is on the mat and it was warm", "en"),
        ("der Hund ist nicht mit der Katze und das ist gut", "de"),
        ("le chat est dans la maison et il est content", "fr"),
        ("el perro es grande y la casa es bonita para todos", "es"),
        ("今天天气很好我们去公园散步吧", "zh"),
        ("", "und"),
        ("12345 67890 !!!", "und"),
    ],
)
def test_lang_id(text, lang):
    assert detect_lang(text) == lang


def test_multimodal_fake_decode_deterministic():
    from janet_spark.multimodal import FEATURE_DIM, decode_payload

    a = decode_payload(b"hello", "image", fake=True)
    b = decode_payload(b"hello", "image", fake=True)
    c = decode_payload(b"world", "image", fake=True)
    assert a.shape == (FEATURE_DIM,)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    # real decode is implemented for all three modalities (png_codec /
    # wav_codec / avi_codec): malformed bytes reject loudly; the genuine
    # codec-library boundary is compressed video bitstreams, which
    # ValueError naming the fourcc
    with pytest.raises(ValueError, match="not a PNG"):
        decode_payload(b"hello", "image", fake=False)
    with pytest.raises(ValueError, match="not a WAV"):
        decode_payload(b"hello", "audio", fake=False)
    with pytest.raises(ValueError, match="not an AVI"):
        decode_payload(b"hello", "video", fake=False)


def test_multimodal_spark_plumbing(spark):
    from janet_spark.multimodal import extract_features, sample_frames, synth_assets

    assets = synth_assets(spark, SF)
    feats = extract_features(assets)
    row = feats.orderBy("asset_id").first()
    assert row["n_bytes"] > 0
    assert len(row["features"]) == 16
    frames = sample_frames(assets)
    counts = frames.groupBy("asset_id").count().toPandas()
    assert (counts["count"] == 4).all()
