"""Round-5 additions: ADVICE fixes (replay idempotency, pair-table
compaction distinctness), the parameterized search facade, incremental
IVF index maintenance, the maintained exact-dup census, and the real
multimodal codecs — PNG decode (png_codec), 16-bit-PCM WAV decode
(wav_codec), uncompressed-AVI frame extraction (avi_codec), and 2x2
box-average image resize."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_conv_sig_read_dedups_replayed_generation(spark, tmp_path):
    """Round-4 advice: an orchestrator replaying a run whose signature
    generation already committed lands the same conv_ids twice; the read
    must dedup so banding/census/prefilter never see doubled rows, and a
    replayed full run must not change the mined pair set."""
    from janet_spark.conversations import conv_neardup_frame
    from janet_spark.dedup_incremental import (
        incremental_conv_dedup_run,
        read_conv_pairs_table,
        read_conv_signature_table,
    )
    from janet_spark.derive import derived_transcripts

    tr = derived_transcripts(spark, "/root/testdata/sf0.001")
    ordinal = F.substring(F.col("conv_id"), 6, 10).cast("long")
    day1 = tr.filter(ordinal % 2 == 0)
    day2 = tr.filter(ordinal % 2 == 1)
    empty = spark.createDataFrame(
        [],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    sig = str(tmp_path / "conv_sigs")
    pairs_path = str(tmp_path / "conv_pairs")

    incremental_conv_dedup_run(spark, sig, day1, empty, pairs_path=pairs_path)
    # replay day 1 (crash after the sig commit, before the run was
    # recorded): same conv_ids land under a second generation id
    incremental_conv_dedup_run(spark, sig, day1, empty, pairs_path=pairs_path)
    incremental_conv_dedup_run(spark, sig, day2, day1, pairs_path=pairs_path)

    sigs = read_conv_signature_table(spark, sig)
    n_convs = tr.select("conv_id").distinct().count()
    assert sigs.count() == n_convs  # deduped on read despite the replay
    maintained = {
        (r.c1, r.c2, r.jaccard)
        for r in read_conv_pairs_table(spark, pairs_path).collect()
    }
    batch = {(r.c1, r.c2, r.jaccard) for r in conv_neardup_frame(tr).collect()}
    assert maintained == batch and maintained


def test_compact_pairs_table_distinct_squeezes_retry_duplicates(spark, tmp_path):
    """Round-4 advice: pair generations are NOT disjoint (a retry
    re-commits identical pairs under a new generation id), so pair-table
    compaction must distinct the union rather than bake the duplicates
    into the compacted generation."""
    from janet_spark.dedup_incremental import (
        PAIRS_SCHEMA,
        _write_generation,
        compact_generations,
        read_pairs_table,
    )

    pairs = str(tmp_path / "pairs")
    day1 = spark.createDataFrame([(1, 2, 0.9), (3, 4, 0.8)], PAIRS_SCHEMA)
    _write_generation(day1, pairs, "run-1000-day")
    # the retry: identical pairs re-committed under a new generation
    _write_generation(day1, pairs, "run-1001-retry")
    day2 = spark.createDataFrame([(5, 6, 0.7)], PAIRS_SCHEMA)
    _write_generation(day2, pairs, "run-1002-day")
    _write_generation(
        spark.createDataFrame([(7, 8, 0.6)], PAIRS_SCHEMA), pairs, "run-1003-day"
    )

    before = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in read_pairs_table(spark, pairs).collect()
    )
    summary = compact_generations(
        spark, pairs, PAIRS_SCHEMA, keep_latest=1, distinct=True
    )
    assert summary["compacted"] and summary["n_absorbed"] == 3
    # the compacted generation holds the DISTINCT union: 3 pairs, not 5
    assert summary["rows"] == 3
    gens = [d for d in os.listdir(pairs) if "compacted-" in d]
    assert len(gens) == 1
    raw = spark.read.schema(PAIRS_SCHEMA).parquet(os.path.join(pairs, gens[0]))
    assert raw.count() == 3  # duplicates squeezed out on disk, not just on read
    after = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in read_pairs_table(spark, pairs).collect()
    )
    assert after == before


def test_png_codec_roundtrip_all_filters_and_shapes():
    """encode -> decode is identity for grey/RGB/RGBA across shapes,
    including images tall enough that every one of the five scanline
    filter types is exercised (the encoder rotates filters per row)."""
    import numpy as np

    from janet_spark.png_codec import decode_png, encode_png

    rng = np.random.default_rng(7)
    for ch in (1, 3, 4):
        for (w, h) in [(1, 1), (1, 7), (7, 1), (8, 5), (31, 23)]:
            px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            data = encode_png(px[:, :, 0] if ch == 1 else px)
            got_w, got_h, got_ch, out = decode_png(data)
            assert (got_w, got_h, got_ch) == (w, h, ch)
            assert np.array_equal(out, px)


@pytest.mark.skipif(
    not os.path.exists("/usr/share/doc/python3/_static/minus.png"),
    reason="system PNG fixtures not present",
)
def test_png_decode_externally_encoded_files():
    """Spec compliance, not just self-consistency: decode PNGs produced
    by REAL external encoders and check semantic ground truth — the
    'minus' icon's dark horizontal bar sits in the middle row, and the
    'plus' icon differs from 'minus' in EXACTLY the center column (its
    vertical bar). A matched encoder/decoder bug pair cannot fake this."""
    import numpy as np

    from janet_spark.png_codec import decode_png

    mn = decode_png(
        open("/usr/share/doc/python3/_static/minus.png", "rb").read()
    )
    pl = decode_png(
        open("/usr/share/doc/python3/_static/plus.png", "rb").read()
    )
    assert (mn[0], mn[1], mn[2]) == (11, 11, 1)
    m, p = mn[3][:, :, 0].astype(int), pl[3][:, :, 0].astype(int)
    row_means = m.mean(axis=1)
    assert row_means.argmin() == 5  # the minus bar is the middle row
    assert row_means[5] < 120 and row_means[1] > 200
    coldiff = np.abs(m - p).sum(axis=0)
    assert coldiff[5] > 0  # the plus's vertical bar
    assert (coldiff[np.arange(11) != 5] == 0).all()  # and ONLY that column


def test_png_decode_rejects_unsupported_shapes_loudly():
    import numpy as np

    from janet_spark.png_codec import decode_png, encode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # palette PNG from the system, if present: reject, never mis-decode
    p = "/usr/share/gitweb/static/git-logo.png"
    if os.path.exists(p):
        with pytest.raises(ValueError, match="unsupported"):
            decode_png(open(p, "rb").read())
    # truncated IDAT
    data = bytearray(encode_png(np.zeros((4, 4, 3), np.uint8)))
    with pytest.raises(ValueError):
        decode_png(bytes(data[:40]))


def test_decode_payload_real_image_path():
    """kind='image' decodes REAL PNG bytes (no fake flag): the feature is
    the 16-bin luminance histogram, normalized. All three modalities now
    decode for real (wav_codec for audio, avi_codec for uncompressed
    video); compressed video bitstreams are the ValueError boundary."""
    import numpy as np

    from janet_spark.multimodal import FEATURE_DIM, decode_payload
    from janet_spark.png_codec import encode_png

    black = encode_png(np.zeros((6, 6, 3), np.uint8))
    f = decode_payload(black, "image")
    assert f.shape == (FEATURE_DIM,)
    assert f[0] == 1.0 and f[1:].sum() == 0.0  # all pixels in bin 0
    white = encode_png(np.full((6, 6, 3), 255, np.uint8))
    f = decode_payload(white, "image")
    assert f[-1] == 1.0
    with pytest.raises(ValueError, match="not an AVI"):
        decode_payload(b"\x00" * 16, "video")
    with pytest.raises(ValueError):
        decode_payload(b"not a png", "image")


def test_wav_codec_roundtrip_and_stdlib_cross_validation():
    """encode_wav/decode_wav roundtrip across channel counts, sample
    counts, and rates — and BOTH directions against the independent
    stdlib `wave` reader/writer, so a consistent-but-wrong codec (shared
    header-offset or interleave mistake) cannot self-certify."""
    import io
    import wave

    import numpy as np

    from janet_spark.wav_codec import decode_wav, encode_wav, synth_samples

    for aid, n, ch, rate in [(0, 60, 1, 8000), (7, 299, 2, 16000), (12345, 100, 3, 44100)]:
        s = synth_samples(aid, n, ch)
        rate_out, ch_out, out = decode_wav(encode_wav(s, rate))
        assert (rate_out, ch_out) == (rate, ch)
        assert np.array_equal(out, s)

    s = synth_samples(42, 128, 2)
    w = wave.open(io.BytesIO(encode_wav(s, 16000)))
    assert (w.getframerate(), w.getnchannels(), w.getsampwidth(), w.getnframes()) == (16000, 2, 2, 128)
    assert np.array_equal(
        np.frombuffer(w.readframes(128), dtype="<i2").reshape(-1, 2), s
    )

    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(2)
    ww.setsampwidth(2)
    ww.setframerate(8000)
    ww.writeframes(s.astype("<i2").tobytes())
    ww.close()
    rate_out, ch_out, out = decode_wav(buf.getvalue())
    assert (rate_out, ch_out) == (8000, 2)
    assert np.array_equal(out, s)


def test_wav_decode_rejects_unsupported_shapes_loudly():
    import struct

    import numpy as np

    from janet_spark.wav_codec import decode_wav, encode_wav

    with pytest.raises(ValueError, match="bad RIFF"):
        decode_wav(b"hello world!")
    with pytest.raises(ValueError, match="no fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")

    def wav_with_fmt(audio_format: int, bits: int) -> bytes:
        fmt = struct.pack("<HHIIHH", audio_format, 1, 8000, 16000, 2, bits)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0)
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with pytest.raises(ValueError, match="audio_format=3"):
        decode_wav(wav_with_fmt(3, 32))  # IEEE float
    with pytest.raises(ValueError, match="8-bit"):
        decode_wav(wav_with_fmt(1, 8))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(encode_wav(np.zeros((4, 2), np.int16), 8000)[:-3])


def test_decode_payload_real_audio_path():
    """kind='audio' decodes REAL WAV bytes (no fake flag): the feature is
    the 16-bin amplitude histogram over the int16 range, normalized."""
    import numpy as np

    from janet_spark.multimodal import FEATURE_DIM, decode_payload
    from janet_spark.wav_codec import encode_wav

    silence = encode_wav(np.zeros((32, 2), np.int16), 8000)
    f = decode_payload(silence, "audio")
    assert f.shape == (FEATURE_DIM,)
    assert f[FEATURE_DIM // 2] == 1.0 and f.sum() == 1.0  # all samples at 0
    loud = encode_wav(np.full((32, 1), 32767, np.int16), 8000)
    f = decode_payload(loud, "audio")
    assert f[-1] == 1.0
    with pytest.raises(ValueError):
        decode_payload(b"not a wav", "audio")


def test_avi_codec_roundtrip_and_loud_rejects():
    """encode_avi/decode_avi roundtrip across frame counts and
    dimensions, including widths that are not multiples of 4 (the DIB
    row-padding path); malformed containers and compressed fourccs
    reject loudly naming the cause."""
    import struct

    import numpy as np

    from janet_spark.avi_codec import decode_avi, encode_avi, synth_frames

    for aid, n, w, h in [(0, 2, 8, 6), (7, 5, 9, 5), (123, 3, 11, 7), (9, 1, 4, 4)]:
        fr = synth_frames(aid, n, w, h)
        out = decode_avi(encode_avi(fr))
        assert out.shape == fr.shape
        assert np.array_equal(out, fr)

    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"hello world!")
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    # patch biCompression in a valid file to a compressed fourcc:
    # the reject must name it (the genuine codec-library boundary)
    b = bytearray(encode_avi(synth_frames(1, 2, 8, 6)))
    at = b.find(b"strf") + 8 + 16  # strf tag+size, then biCompression offset
    struct.pack_into("<I", b, at, struct.unpack("<I", b"h264")[0])
    with pytest.raises(ValueError, match="h264"):
        decode_avi(bytes(b))


def test_decode_payload_real_video_path():
    """kind='video' decodes REAL uncompressed-AVI bytes (no fake flag):
    the feature is the 16-bin luminance histogram over all frames."""
    import numpy as np

    from janet_spark.avi_codec import encode_avi
    from janet_spark.multimodal import FEATURE_DIM, decode_payload

    black = encode_avi(np.zeros((3, 6, 8, 3), np.uint8))
    f = decode_payload(black, "video")
    assert f.shape == (FEATURE_DIM,)
    assert f[0] == 1.0 and f[1:].sum() == 0.0
    white = encode_avi(np.full((3, 6, 8, 3), 255, np.uint8))
    assert decode_payload(white, "video")[-1] == 1.0


def test_video_frame_sample_matches_direct_synthesis(spark):
    """The registered query's Spark path (synth -> Arrow hop -> decode ->
    stride-2 sample) agrees with statistics computed directly from the
    frame generator."""
    import numpy as np

    from janet_spark.avi_codec import synth_frames
    from janet_spark.queries_extra import q_video_frame_sample

    got = q_video_frame_sample(spark, _SF).toPandas()
    # every asset contributes ceil(n_frames / 2) sampled frames
    per_asset = got.groupby("asset_id").size()
    for aid, cnt in per_asset.head(25).items():
        assert cnt == (int(aid) % 6 + 2 + 1) // 2
    for row in got.head(40).itertuples():
        aid = int(row.asset_id)
        fr = synth_frames(aid, aid % 6 + 2, aid % 10 + 6, aid % 8 + 5)
        assert row.n_frames == fr.shape[0]
        want = round(float(fr[row.frame_idx, :, :, 0].astype(np.int64).mean()), 4)
        assert row.mean_c0 == want


def test_image_resize_stats_matches_direct_numpy(spark):
    """The registered resize query (decode -> 2x2 box average -> stats)
    agrees with a direct numpy resize of the synthesized pixels,
    including odd-dimension edge trimming."""
    import numpy as np

    from janet_spark.png_codec import synth_pixels
    from janet_spark.queries_extra import q_image_resize_stats

    got = q_image_resize_stats(spark, _SF).toPandas()
    assert len(got) == 500
    for row in got.head(25).itertuples():
        aid = int(row.asset_id)
        w, h = aid % 24 + 8, aid % 16 + 8
        px = synth_pixels(aid, w, h).astype(np.float64)
        t = px[: h // 2 * 2, : w // 2 * 2]
        rs = (t[0::2, 0::2] + t[1::2, 0::2] + t[0::2, 1::2] + t[1::2, 1::2]) / 4
        assert (row.r_width, row.r_height) == (w // 2, h // 2)
        assert row.rmean_c1 == round(float(rs[:, :, 1].mean()), 4)
        assert (row.rmin_c0, row.rmax_c0) == (rs[:, :, 0].min(), rs[:, :, 0].max())


def test_audio_decode_stats_matches_direct_synthesis(spark):
    """The registered query's Spark path (synth -> Arrow hop -> decode ->
    stats) agrees with statistics computed directly from the sample
    generator, for every asset at sf0.001."""
    import numpy as np

    from janet_spark.queries_extra import q_audio_decode_stats
    from janet_spark.wav_codec import synth_samples

    got = q_audio_decode_stats(spark, _SF).toPandas()
    assert len(got) == 500
    for row in got.head(25).itertuples():
        s = synth_samples(int(row.asset_id), int(row.asset_id) % 240 + 60, 2)
        assert row.n_samples == s.shape[0]
        assert row.sample_rate == 8000 + int(row.asset_id) % 3 * 4000
        assert row.mean_c0 == round(float(s[:, 0].astype(np.int64).mean()), 4)
        assert (row.min_c1, row.max_c1) == (s[:, 1].min(), s[:, 1].max())


def test_state_dir_env_override(tmp_path, monkeypatch):
    """JANET_SPARK_STATE_DIR points maintained state at a durable root
    instead of the world-shared OS temp dir."""
    from janet_spark.dedup_incremental import state_dir_for_input

    d = state_dir_for_input("/root/testdata/sf0.001", "documents.parquet", "x")
    assert d.startswith(os.path.join("/tmp", "janet_spark_state")) or (
        "janet_spark_state" in d
    )
    monkeypatch.setenv("JANET_SPARK_STATE_DIR", str(tmp_path / "durable"))
    d2 = state_dir_for_input("/root/testdata/sf0.001", "documents.parquet", "x")
    assert d2.startswith(str(tmp_path / "durable"))
    assert os.path.basename(d2) == os.path.basename(d)  # fingerprint unchanged


# ---------------------------------------------------------------------------
# parameterized search facade (round-4 verdict "What's missing" #1)
# ---------------------------------------------------------------------------

_SF = "/root/testdata/sf0.001"


def _duck_search(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{_SF}/documents.parquet'")
    return con.sql(sql).df()


def test_search_facade_novel_queries_match_brute_force_oracle(spark):
    """The facade must serve queries a user composes at the keyboard, not
    just the registered module constants (the reference's Playwright test
    types 'cobra' into the search box, apps/web/tests/pdfs.spec.ts:32-35).
    Three never-registered keystrokes — typo'd term + live prefix, a
    mid-word prefix alone, and a term with both a typo neighbor and
    prefix completions — are checked value-for-value against the
    brute-force DuckDB oracle at the facade's Meili-default config."""
    from janet_spark.queries_relational import t
    from janet_spark.search import search, suggest_oracle_sql

    rows = [
        (1, "vektor qu", "src1", "en"),  # typo of 'vector' + prefix qu->query
        (2, "fil", "src3", "en"),  # bare prefix keystroke
        (3, "windo merge", "src0", "en"),  # typo/prefix ambiguous last term
    ]
    docs = t(spark, _SF, "documents")
    queries = spark.createDataFrame(
        rows, "q_id int, q_text string, f_source string, f_lang string"
    )
    got = search(docs, queries).toPandas()
    want = _duck_search(suggest_oracle_sql(rows))
    assert len(got) > 0  # the keystrokes really match documents
    got = got.sort_values(["q_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(
        got.astype({"score": float}), want.astype({"score": float}),
        check_dtype=False,
    )


def test_search_text_single_keystroke(spark):
    """One-string convenience wrapper: what route.ts receives per request.
    A dead term ('cobra' — absent from the corpus, no typo neighbor, no
    completion) returns an empty frame rather than erroring."""
    from janet_spark.queries_relational import t
    from janet_spark.search import search_text

    docs = t(spark, _SF, "documents")
    hits = search_text(spark, docs, "merge sor", "src7").toPandas()
    assert len(hits) > 0
    assert list(hits.columns) == ["q_id", "rank", "doc_id", "score"]
    assert (hits["rank"] <= 10).all()
    dead = search_text(spark, docs, "cobra", "src7").toPandas()
    assert len(dead) == 0


def test_search_facade_flags_reproduce_registered_fixtures(spark):
    """typo=False/prefix=False must equal the exact-only registered query
    (the refactor made all four registered searches facade fixtures; this
    pins the flag wiring itself)."""
    from janet_spark.queries_relational import t
    from janet_spark.search import _queries_df, q_ranked_search, search

    docs = t(spark, _SF, "documents")
    via_facade = (
        search(docs, _queries_df(spark), typo=False, prefix=False)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    registered = (
        q_ranked_search(spark, _SF)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_facade, registered)


# ---------------------------------------------------------------------------
# incremental IVF index maintenance (round-4 verdict "What's wrong" #1)
# ---------------------------------------------------------------------------


def test_ivf_delta_append_equals_rebuilt(spark, tmp_path):
    """Two-day index (bootstrap over old + delta-append over new, held-fixed
    centroids) must equal the index rebuilt from scratch over the full
    corpus with the same centroids — row-for-row in the assignment table,
    and through compaction."""
    from janet_spark.dedup_incremental import (
        _live_generation_dirs,
        compact_generations,
    )
    from janet_spark.queries_extra import (
        IVF_INDEX_SCHEMA,
        incremental_ivf_index_run,
        ivf_assign_frame,
        ivf_centroids,
    )
    from janet_spark.queries_relational import t

    emb = t(spark, _SF, "embeddings")
    is_new = F.col("vec_id") % 5 == 0
    old, delta = emb.filter(~is_new), emb.filter(is_new)
    cent = ivf_centroids(old)

    idx = str(tmp_path / "ivf")
    incremental_ivf_index_run(old, cent, idx, "bootstrap")
    incremental_ivf_index_run(delta, cent, idx, "delta-day2")
    assert len(_live_generation_dirs(idx)) == 2

    def table():
        return (
            spark.read.schema(IVF_INDEX_SCHEMA)
            .parquet(*_live_generation_dirs(idx))
            .select("vec_id", "cell")
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

    rebuilt = (
        ivf_assign_frame(emb, cent)
        .select("vec_id", "cell")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(table(), rebuilt)

    # replaying the delta run must replace, not duplicate
    incremental_ivf_index_run(delta, cent, idx, "delta-day2")
    pd.testing.assert_frame_equal(table(), rebuilt)

    # compaction (generations disjoint by construction) preserves the table
    compact_generations(spark, idx, IVF_INDEX_SCHEMA, keep_latest=0)
    assert len(_live_generation_dirs(idx)) == 1
    pd.testing.assert_frame_equal(table(), rebuilt)


# ---------------------------------------------------------------------------
# maintained exact-dup census (round-4 verdict "What's wrong" #2)
# ---------------------------------------------------------------------------


def test_exact_census_maintained_equals_scanned_two_generations(spark, tmp_path):
    """Census built from two daily deltas (sum-on-read over generations)
    must equal the census scanned from the full corpus in one pass, both
    as a table and through the report's exact-dup aggregates — and
    compaction must preserve it."""
    from janet_spark.dedup_incremental import (
        EXACT_CENSUS_SCHEMA,
        compact_generations,
        exact_census_of,
        incremental_exact_census_run,
        read_exact_census,
    )
    from janet_spark.queries_relational import t

    docs = t(spark, _SF, "documents")
    day1 = docs.filter(F.col("doc_id") % 3 != 0)
    day2 = docs.filter(F.col("doc_id") % 3 == 0)

    path = str(tmp_path / "census")
    incremental_exact_census_run(day1, path, "bootstrap")
    incremental_exact_census_run(day2, path, "day2")

    def table():
        return (
            read_exact_census(spark, path)
            .toPandas()
            .sort_values(["kk", "source"])
            .reset_index(drop=True)
        )

    scanned = (
        exact_census_of(docs)
        .toPandas()
        .sort_values(["kk", "source"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(table(), scanned)

    # replay of a committed day replaces, never double-counts
    incremental_exact_census_run(day2, path, "day2")
    pd.testing.assert_frame_equal(table(), scanned)

    # compaction: reads re-aggregate, so plain-union compaction is exact
    compact_generations(spark, path, EXACT_CENSUS_SCHEMA, keep_latest=0)
    pd.testing.assert_frame_equal(table(), scanned)


def test_dedup_report_incremental_never_reads_text(spark):
    """The daily report's plan must be free of any documents TEXT scan:
    every parquet read of the documents table is pruned to
    (doc_id, source) — the md5-over-text census work happened at delta
    time, not report time."""
    import re

    from janet_spark.queries_text import q_dedup_report_incremental

    plan = (
        q_dedup_report_incremental(spark, _SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        assert "text" not in m.group(1), m.group(1)


def test_audio_frame_features_matches_direct_synthesis(spark):
    """The framed-feature query (decode -> 64-sample frames -> RMS/ZCR)
    agrees with features computed directly from the sample generator,
    including the partial tail frame."""
    import math

    import numpy as np

    from janet_spark.queries_extra import q_audio_frame_features
    from janet_spark.wav_codec import synth_samples

    got = q_audio_frame_features(spark, _SF).toPandas()
    # every asset contributes ceil(n_samples / 64) frames
    per_asset = got.groupby("asset_id").size()
    for aid, cnt in per_asset.head(25).items():
        assert cnt == (int(aid) % 240 + 60 + 63) // 64
    for row in got.head(60).itertuples():
        aid = int(row.asset_id)
        v = synth_samples(aid, aid % 240 + 60, 2)[:, 0].astype(np.int64)
        fr = v[row.frame_idx * 64 : (row.frame_idx + 1) * 64]
        assert row.frame_len == len(fr)
        assert row.rms_c0 == round(math.sqrt(int((fr * fr).sum()) / len(fr)), 4)
        assert row.zcr_c0 == int(((fr[:-1] * fr[1:]) < 0).sum())


def test_pq_encode_and_adc_match_direct_numpy(spark):
    """PQ codes are the argmin-L2 codeword per subspace, and the ADC
    top-k from the broadcast-join tail equals a direct numpy ADC over
    the same codes — checked for both the registered m=4 geometry and
    the parameterized m=8 one."""
    import numpy as np

    from janet_spark.queries_extra import (
        _pq_adc_search,
        pq_codebooks,
        pq_encode_frame,
        pq_lut_frame,
    )

    emb = spark.read.parquet(f"{_SF}/embeddings.parquet")
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    v = np.array(list(pdf["embedding"]), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    cent = pq_codebooks(emb, k=16)
    c_ids = np.array([int(r["vec_id"]) for r in cent])
    c = np.array([r["embedding"] for r in cent], dtype=np.float64)

    for m in (4, 8):
        sub = v.shape[1] // m
        codes = (
            pq_encode_frame(emb, cent, m=m)
            .toPandas()
            .sort_values(["vec_id", "s"])
            .reset_index(drop=True)
        )
        assert len(codes) == len(pdf) * m
        # direct argmin per subspace
        want = {}
        for s in range(m):
            vs, cs = v[:, s * sub : (s + 1) * sub], c[:, s * sub : (s + 1) * sub]
            d = ((vs[:, None, :] - cs[None, :, :]) ** 2).sum(-1)
            for i, vid in enumerate(ids):
                want[(int(vid), s)] = int(c_ids[d[i].argmin()])
        got_codes = {
            (int(r.vec_id), int(r.s)): int(r.code) for r in codes.itertuples()
        }
        assert got_codes == want

        # ADC top-3 for queries vec_id < 5 vs direct numpy
        lut = pq_lut_frame(emb.filter("vec_id < 5"), cent, m=m)
        got = _pq_adc_search(pq_encode_frame(emb, cent, m=m), lut, topk=3).toPandas()
        code_idx = {int(cid): j for j, cid in enumerate(c_ids)}
        for qid in range(5):
            qv = v[ids == qid][0]
            d_adc = np.zeros(len(ids))
            for s in range(m):
                qs = qv[s * sub : (s + 1) * sub]
                cs = c[:, s * sub : (s + 1) * sub]
                pdists = ((qs[None, :] - cs) ** 2).sum(-1)
                codes_s = np.array(
                    [code_idx[want[(int(vid), s)]] for vid in ids]
                )
                d_adc += pdists[codes_s]
            mask = ids != qid
            order = np.lexsort((ids[mask], d_adc[mask]))[:3]
            want_top = [int(ids[mask][j]) for j in order]
            got_top = got[got.qid == qid].sort_values("rank")["vec_id"].tolist()
            assert got_top == want_top


def test_ivf_spill_doubles_index_and_widens_candidates(spark):
    """spill=2 assignment lands every vector in exactly its 2 nearest
    distinct cells; a 1-probe query over the spilled index sees a
    candidate superset of the 1-probe query over the spill=1 index."""
    from janet_spark.queries_extra import (
        _ivf_search,
        ivf_assign_frame,
        ivf_centroids,
    )

    emb = spark.read.parquet(f"{_SF}/embeddings.parquet")
    cent = ivf_centroids(emb)
    a1 = ivf_assign_frame(emb, cent)
    a2 = ivf_assign_frame(emb, cent, spill=2)
    n = emb.count()
    assert a2.count() == 2 * n
    # two DISTINCT cells per vector
    assert (
        a2.groupBy("vec_id")
        .agg(F.countDistinct("cell").alias("k"))
        .filter("k != 2")
        .count()
        == 0
    )
    # the spill-2 assignment contains the spill-1 assignment
    assert a1.join(a2, ["vec_id", "cell"], "left_anti").count() == 0
    got1 = {
        (r.qid, r.vec_id)
        for r in _ivf_search(emb, a1, cent, n_probes=1).collect()
    }
    got2 = _ivf_search(emb, a2, cent, n_probes=1).toPandas()
    assert len(got2) == 30  # 10 queries x top-3, dedup held
    # per-query result sets rank at least as well: every spill-2 top-3
    # cosine >= the spill-1 top-3 cosine at the same rank
    got1_ranked = {
        (r.qid, r.rank): r.cosine
        for r in _ivf_search(emb, a1, cent, n_probes=1).collect()
    }
    for r in got2.itertuples():
        assert r.cosine >= got1_ranked[(r.qid, r.rank)] - 1e-9


def test_pq_rerank_dominates_pure_adc(spark):
    """The re-ranked PQ query returns exact cosines, its candidates all
    come from the ADC shortlist, and per (query, rank) its cosine is >=
    the exact cosine of the pure-ADC top-3 (re-ranking a superset can
    only improve the exact-metric ordering)."""
    import numpy as np

    from janet_spark.queries_extra import (
        _PQ_RERANK_R,
        _pq_adc_search,
        pq_codebooks,
        pq_encode_frame,
        pq_lut_frame,
        q_ann_pq_rerank_topk,
        q_ann_pq_topk,
    )

    emb = spark.read.parquet(f"{_SF}/embeddings.parquet")
    pdf = emb.toPandas().set_index("vec_id")
    vecs = {int(i): np.array(e, dtype=np.float64) for i, e in pdf["embedding"].items()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    rr = q_ann_pq_rerank_topk(spark, _SF).toPandas()
    assert len(rr) == 30
    cent = pq_codebooks(emb)
    short = (
        _pq_adc_search(
            pq_encode_frame(emb, cent),
            pq_lut_frame(emb.filter("vec_id < 10"), cent),
            topk=_PQ_RERANK_R,
        )
        .toPandas()
        .groupby("qid")["vec_id"]
        .apply(set)
        .to_dict()
    )
    adc = q_ann_pq_topk(spark, _SF).toPandas()
    for row in rr.itertuples():
        assert row.vec_id in short[row.qid]
        assert row.cosine == round(cos(vecs[row.qid], vecs[row.vec_id]), 4)
    # re-rank top-3 = the 3 exact-cosine maxima of the shortlist, so
    # position-wise (both sides sorted desc by exact cosine) it dominates
    # the ADC top-3, which is just another 3-subset of the shortlist
    for qid, grp in rr.groupby("qid"):
        got = grp.sort_values("rank")["cosine"].tolist()
        a_cos = sorted(
            (
                round(cos(vecs[qid], vecs[int(v)]), 4)
                for v in adc[adc.qid == qid]["vec_id"]
            ),
            reverse=True,
        )
        assert all(g >= a - 1e-9 for g, a in zip(got, a_cos))


def test_ivfadc_candidates_respect_probed_cells_and_exact_cosines(spark):
    """IVFADC results: every returned neighbor's IVF cell is one of the
    query's 2 probed cells (candidates never leave the probe scope), and
    the returned cosines are EXACT (the re-rank read the float vectors,
    not the quantized codes)."""
    import numpy as np

    from janet_spark.queries_extra import (
        _IVF_PROBES,
        _ivf_probe_frame,
        ivf_assign_frame,
        ivf_centroids,
        q_ann_ivfadc_topk,
    )

    emb = spark.read.parquet(f"{_SF}/embeddings.parquet")
    got = q_ann_ivfadc_topk(spark, _SF).toPandas()
    assert len(got) == 30
    cent = ivf_centroids(emb)
    cells = {
        int(r.vec_id): int(r.cell)
        for r in ivf_assign_frame(emb, cent).select("vec_id", "cell").collect()
    }
    probed = (
        _ivf_probe_frame(emb.filter("vec_id < 10"), cent, _IVF_PROBES)
        .toPandas()
        .groupby("qid")["cell"]
        .apply(set)
        .to_dict()
    )
    pdf = emb.toPandas().set_index("vec_id")
    vecs = {int(i): np.array(e, dtype=np.float64) for i, e in pdf["embedding"].items()}
    for row in got.itertuples():
        assert cells[int(row.vec_id)] in probed[int(row.qid)]
        q, v = vecs[int(row.qid)], vecs[int(row.vec_id)]
        want = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        assert row.cosine == round(want, 4)


def test_line_dedup_corpus_drops_shared_lines_keeps_order(spark):
    """CCNet line dedup: a 16-word line appearing in >= 2 distinct docs is
    removed from every doc; unique lines survive in original order; a doc
    made entirely of boilerplate cleans to the empty string."""
    from janet_spark.queries_text import line_dedup_corpus_frame

    def line(tag):
        return " ".join(f"{tag}{j}" for j in range(16))

    A, B = line("boilA"), line("boilB")
    U1, U2, U3 = line("uniq1"), line("uniq2"), line("uniq3")
    docs = spark.createDataFrame(
        [
            (1, " ".join([A, U1, B])),
            (2, " ".join([B, U2, A])),
            (3, U3),
            (4, A),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_dedup_corpus_frame(docs).collect()}
    assert (rows[1].n_lines, rows[1].n_dropped, rows[1].clean_text) == (3, 2, U1)
    assert (rows[2].n_lines, rows[2].n_dropped, rows[2].clean_text) == (3, 2, U2)
    assert (rows[3].n_lines, rows[3].n_dropped, rows[3].clean_text) == (1, 0, U3)
    assert (rows[4].n_lines, rows[4].n_dropped, rows[4].clean_text) == (1, 1, "")


def test_line_dedup_corpus_within_doc_repeat_not_boilerplate(spark):
    """A line repeated twice WITHIN one doc but in no other doc is NOT
    corpus boilerplate (the census counts DISTINCT docs): both copies
    survive, in order."""
    from janet_spark.queries_text import line_dedup_corpus_frame

    def line(tag):
        return " ".join(f"{tag}{j}" for j in range(16))

    R, U = line("rep"), line("uniq")
    docs = spark.createDataFrame(
        [(1, " ".join([R, U, R]))], "doc_id long, text string"
    )
    row = line_dedup_corpus_frame(docs).collect()[0]
    assert (row.n_lines, row.n_dropped) == (3, 0)
    assert row.clean_text == " ".join([R, U, R])


def test_line_census_maintained_equals_scanned_two_generations(spark, tmp_path):
    """The maintained line census (two daily-delta generations, summed on
    read) must drive line_dedup_corpus_frame to the exact output of the
    standalone full-scan form — including a boilerplate line whose two
    occurrences arrive in DIFFERENT deltas (the additivity property)."""
    from pyspark.sql import functions as F

    from janet_spark.dedup_incremental import (
        incremental_line_census_run,
        read_line_census,
    )
    from janet_spark.queries_text import _line_docs, line_dedup_corpus_frame

    def line(tag):
        return " ".join(f"{tag}{j}" for j in range(16))

    A, U1, U2 = line("boilA"), line("uniq1"), line("uniq2")
    docs = spark.createDataFrame(
        [(1, " ".join([A, U1])), (2, " ".join([U2, A]))],
        "doc_id long, text string",
    )
    path = str(tmp_path / "line_census")
    for day, parity in (("d1", 0), ("d2", 1)):
        delta = docs.filter(F.col("doc_id") % 2 == parity)
        delta_lines = _line_docs(delta).select(
            "doc_id", F.md5("line").alias("line_sig")
        )
        incremental_line_census_run(delta_lines, path, day)

    census = read_line_census(spark, path)
    maintained = sorted(
        map(tuple, line_dedup_corpus_frame(docs, census=census).collect())
    )
    scanned = sorted(map(tuple, line_dedup_corpus_frame(docs).collect()))
    assert maintained == scanned
    # the cross-delta boilerplate line A was dropped from BOTH docs
    by_id = dict((r[0], r) for r in maintained)
    assert by_id[1][3] == U1 and by_id[2][3] == U2


def test_write_table_dynamic_partition_overwrite_emulation(spark, tmp_path):
    """Without a catalog, write_table must emulate Iceberg
    overwritePartitions on parquet: partitions present in the frame are
    replaced whole, untouched partitions survive, and a repeat of the
    same write is idempotent."""
    from janet_spark.sources import write_table

    path = str(tmp_path / "tbl")
    day1 = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c")], "part_bucket int, v string"
    )
    assert write_table(day1, path, partition_by=("part_bucket",)) == "parquet"
    # rewrite ONLY bucket 1
    day2 = spark.createDataFrame([(1, "c2")], "part_bucket int, v string")
    assert write_table(day2, path, partition_by=("part_bucket",)) == "parquet"
    got = sorted(
        (r.part_bucket, r.v) for r in spark.read.parquet(path).collect()
    )
    assert got == [(0, "a"), (0, "b"), (1, "c2")]
    # idempotent replay
    write_table(day2, path, partition_by=("part_bucket",))
    assert sorted(
        (r.part_bucket, r.v) for r in spark.read.parquet(path).collect()
    ) == [(0, "a"), (0, "b"), (1, "c2")]


def test_write_table_unpartitioned_swap_and_spec_guard(spark, tmp_path):
    from janet_spark.sources import write_table

    path = str(tmp_path / "flat")
    write_table(spark.createDataFrame([(1,)], "x int"), path)
    write_table(spark.createDataFrame([(2,)], "x int"), path)
    assert [r.x for r in spark.read.parquet(path).collect()] == [2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="one partition column"):
        write_table(
            spark.createDataFrame([(1, 2)], "a int, b int"),
            path,
            partition_by=("a", "b"),
        )


def test_dsir_importance_ranks_target_like_docs_higher(spark):
    """DSIR semantics: documents whose hashed-ngram bag matches the
    target (lang='en') vocabulary score a higher mean importance weight
    than off-target docs with disjoint vocabulary, and a raw doc written
    in the target vocabulary outranks one that isn't — the classifier
    generalizes past the lang label to the feature distribution."""
    from janet_spark.queries_text import dsir_importance_frame

    en = "the model trains on curated english text with common words"
    zz = "zzq qqz zqz qzq zzz qqq zqq qzz zzqq qqzz"
    rows = (
        [(i, "en", en + f" variant {i}") for i in range(8)]
        + [(100, "xx", en + " variant 100")]  # target-like bag, raw label
        + [(200 + i, "xx", zz + f" tail {i}") for i in range(8)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = {r.doc_id: r.dsir_logw for r in dsir_importance_frame(docs).collect()}
    assert w[100] > w[200]  # same raw label, target-like bag wins
    en_mean = sum(w[i] for i in range(8)) / 8
    zz_mean = sum(w[200 + i] for i in range(8)) / 8
    assert en_mean > 0 > zz_mean


def test_dsir_select_is_deterministic_topk(spark):
    """dsir_select returns exactly K rows, ordered by (weight desc,
    doc_id), independent of input partitioning."""
    from janet_spark.queries_text import _DSIR_SELECT_K, q_dsir_select

    got = q_dsir_select(spark, "/root/testdata/sf0.001").collect()
    assert len(got) == _DSIR_SELECT_K
    keys = [(-r.dsir_logw, r.doc_id) for r in got]
    assert keys == sorted(keys)


def test_search_facade_apostrophe_query_safe_oracle(spark):
    """suggest_oracle_sql must escape user-composed text: a query with an
    apostrophe ("cobra's") renders a syntactically valid oracle (no SQL
    breakage, no injection channel) and both sides agree on the result."""
    from janet_spark.queries_relational import t
    from janet_spark.search import search, suggest_oracle_sql

    rows = [(1, "cobra's merge", "src0", "en")]
    docs = t(spark, _SF, "documents")
    queries = spark.createDataFrame(
        rows, "q_id int, q_text string, f_source string, f_lang string"
    )
    got = search(docs, queries).toPandas()
    want = _duck_search(suggest_oracle_sql(rows))  # raises if not escaped
    assert len(got) == len(want)


def test_image_stats_greyscale_and_audio_stats_mono(spark):
    """Channel-general stats: a colour-type-0 (greyscale) PNG and a mono
    WAV are legitimate codec outputs; the stats operators broadcast the
    single plane/channel instead of crashing on a hard-coded index."""
    import numpy as np

    from janet_spark.multimodal import decode_audio_stats, decode_image_stats
    from janet_spark.png_codec import encode_png
    from janet_spark.wav_codec import encode_wav

    grey = (np.arange(12, dtype=np.uint8).reshape(3, 4, 1) * 7) % 256
    png = encode_png(grey)
    img = spark.createDataFrame(
        [(1, bytearray(png))], "asset_id long, payload binary"
    )
    r = decode_image_stats(img).collect()[0]
    assert (r.width, r.height, r.n_channels) == (4, 3, 1)
    assert r.sum_c0 == r.sum_c1 == r.sum_c2 == int(grey.astype(np.int64).sum())
    assert (r.min_c0, r.max_c0) == (r.min_c2, r.max_c2)

    mono = (np.arange(32, dtype=np.int16).reshape(-1, 1) * 501) - 8000
    wav = encode_wav(mono, 8000)
    aud = spark.createDataFrame(
        [(2, bytearray(wav))], "asset_id long, payload binary"
    )
    s = decode_audio_stats(aud).collect()[0]
    assert (s.n_channels, s.n_samples) == (1, 32)
    assert s.sum_c0 == s.sum_c1 == int(mono.astype(np.int64).sum())
    assert (s.min_c0, s.max_c0) == (s.min_c1, s.max_c1)


def test_decode_payload_rejects_empty_media_loudly():
    """A structurally valid zero-sample WAV (or 0x0 PNG) must raise, not
    return a silent all-NaN feature vector."""
    import numpy as np
    import pytest as _pytest

    from janet_spark.multimodal import decode_payload
    from janet_spark.wav_codec import encode_wav

    empty_wav = encode_wav(np.zeros((0, 1), dtype=np.int16), 8000)
    with _pytest.raises(ValueError, match="zero samples"):
        decode_payload(empty_wav, "audio")


def test_write_table_recovers_stranded_swap(spark, tmp_path):
    """Crash window between rename(table, __old) and rename(staging,
    table): the sole surviving copy sits at __old. The next write_table
    must restore it (never rmtree it) before swapping in the new data —
    and a plain reader path sees the restored table if no write happens."""
    import os

    from janet_spark.sources import write_table

    path = str(tmp_path / "tbl")
    write_table(spark.range(5).toDF("id"), path)
    # simulate the crash: table moved aside, new staging never landed
    os.rename(path, path + "__old")
    assert not os.path.isdir(path)
    write_table(spark.range(9).toDF("id"), path)  # must not delete __old copy
    assert spark.read.parquet(path).count() == 9
    assert not os.path.isdir(path + "__old")


def test_write_generation_race_loser_discards_and_cleans(spark, tmp_path, monkeypatch):
    """Two sessions race the same gen_id: the loser's rename hits the
    winner's committed dir (ENOTEMPTY), must NOT crash, and must leave no
    staging debris behind."""
    import os

    import janet_spark.dedup_incremental as di

    sig_path = str(tmp_path / "state")
    df = spark.range(3).selectExpr("cast(id as long) as doc_id")
    real_rename = os.rename

    def racing_rename(src, dst):
        if "_staging_" in src and dst.endswith("gen=raced"):
            # the winner commits between our exists-check and our rename
            os.makedirs(dst, exist_ok=True)
            with open(os.path.join(dst, "part-0.parquet"), "w") as f:
                f.write("winner")
            raise OSError(39, "Directory not empty")
        return real_rename(src, dst)

    monkeypatch.setattr(di.os, "rename", racing_rename)
    final = di._write_generation(df, sig_path, "raced")
    assert os.path.isdir(final)
    with open(os.path.join(final, "part-0.parquet")) as f:
        assert f.read() == "winner"  # the winner's generation survived whole
    debris = [e for e in os.listdir(sig_path) if e.startswith("_staging_")]
    assert debris == []


def test_bloom_prefilter_never_false_negative(spark):
    """The Bloom guarantee: every delta doc whose exact text IS in the
    history must be flagged maybe_dup (false positives allowed, false
    negatives impossible). Planted dups across a 300-doc corpus."""
    from janet_spark.sketches import bloom_dedup_prefilter_frame

    hist_rows = [(i, f"history text number {i}") for i in range(150)]
    delta_rows = [(1000 + i, f"history text number {i * 3}") for i in range(50)] + [
        (2000 + i, f"fresh delta text {i}") for i in range(100)
    ]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")
    got = {r.doc_id: r.maybe_dup for r in bloom_dedup_prefilter_frame(hist, delta).collect()}
    for i in range(50):  # true dups: i*3 < 150 always in history
        assert got[1000 + i] is True
    fp = sum(1 for i in range(100) if got[2000 + i])
    assert fp < 30  # m=16^5 bits / 150 keys * 3 hashes: FP rate ~0 here;
    # the loose bound keeps the pin valid for any reasonable m resize


def test_cms_estimate_never_below_true_count(spark):
    """The count-min guarantee: est >= true for every reported token, and
    the unambiguous heavy hitter surfaces at rank 1 with an exact
    estimate when its counters are collision-free."""
    from janet_spark.sketches import heavy_hitters_cms_frame

    rows = [(i, "alpha " * 50) for i in range(10)] + [
        (100 + i, f"tail{i} beta") for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = heavy_hitters_cms_frame(docs).collect()
    assert all(r.est_n >= r.true_n for r in got)
    assert got[0].tok == "alpha" and got[0].true_n == 500


def test_hll_estimate_accuracy_and_duplicate_invariance(spark):
    """HyperLogLog contract: (a) the estimate lands within a few rsd
    (1.04/sqrt(256) = 6.5%) of the exact distinct count on both the
    linear-counting range and the raw-estimator range; (b) the sketch is
    a function of the distinct key SET — re-feeding every key 3x must
    not move the estimate by one ulp (the property count(*) lacks)."""
    from janet_spark.sketches import distinct_count_hll_frame

    rows = [(i, f"small key {i}", "lc") for i in range(100)] + [
        (10_000 + i, f"big key {i}", "raw") for i in range(5000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in distinct_count_hll_frame(docs).collect()}
    assert got["lc"].exact_distinct == 100 and got["raw"].exact_distinct == 5000
    for grp in ("lc", "raw"):
        r = got[grp]
        assert abs(r.hll_est - r.exact_distinct) / r.exact_distinct < 0.2
    tripled = docs.union(docs).union(docs)
    again = {r.source: r for r in distinct_count_hll_frame(tripled).collect()}
    for grp in ("lc", "raw"):
        assert again[grp].hll_est == got[grp].hll_est
        assert again[grp].zero_buckets == got[grp].zero_buckets
    # NULL keys are EXCLUDED, not bucketed: a NULL text must not create a
    # phantom register row (it would inflate `filled` without adding to
    # the 2^-mx sum and skew both estimate and zero_buckets)
    with_nulls = docs.union(
        spark.createDataFrame(
            [(90_000, None, "lc"), (90_001, None, "raw")],
            "doc_id long, text string, source string",
        )
    )
    nulled = {r.source: r for r in distinct_count_hll_frame(with_nulls).collect()}
    for grp in ("lc", "raw"):
        assert nulled[grp].hll_est == got[grp].hll_est
        assert nulled[grp].zero_buckets == got[grp].zero_buckets
        assert nulled[grp].exact_distinct == got[grp].exact_distinct


def test_hll_maintained_registers_equal_full_rebuild(spark, tmp_path):
    """Max-merged register generations must equal the full-corpus
    register table exactly — even when deltas OVERLAP (a replayed day),
    the case sum-merge censuses cannot tolerate: max is idempotent."""
    from janet_spark.sketches import (
        hll_estimate_frame,
        hll_registers_frame,
        incremental_hll_run,
        read_hll_registers,
    )

    rows = [(i, f"key {i}", f"s{i % 3}") for i in range(900)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    path = str(tmp_path / "hll_regs")
    incremental_hll_run(docs.filter("doc_id < 400"), path, "day1")
    # day2 REPLAYS docs 300-399 (overlap) alongside its fresh rows
    incremental_hll_run(docs.filter("doc_id >= 300"), path, "day2")
    maintained = read_hll_registers(spark, path)
    full = hll_registers_frame(docs)
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, full.collect())
    )
    est_m = sorted(map(tuple, hll_estimate_frame(maintained).collect()))
    est_f = sorted(map(tuple, hll_estimate_frame(full).collect()))
    assert est_m == est_f


def test_quantile_hist_half_bucket_accuracy(spark):
    """Histogram-quantile contract: the estimate is the midpoint of the
    bucket holding the ceil(q·n)-th order statistic, so it sits within
    half a bucket width (1/16) of that order statistic — checked against
    numpy's sorted array at every registered q on a skewed sample."""
    import math

    from janet_spark.sketches import hist_counts_frame, hist_quantiles_frame

    vals = [round(0.01 + (i * i) % 97 + i / 7.0, 3) for i in range(500)]
    rows = [(i, "m", v) for i, v in enumerate(vals)]
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    got = hist_quantiles_frame(hist_counts_frame(events)).collect()[0]
    assert got.n_events == 500
    srt = sorted(vals)
    for q, name in [(0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")]:
        order_stat = srt[math.ceil(q * 500) - 1]
        assert abs(getattr(got, name) - order_stat) <= 1 / 16 + 1e-12, (q, name)


def test_quantile_hist_maintained_equals_full_rebuild(spark, tmp_path):
    """Sum-merged histogram generations over a disjoint event split must
    equal the full-corpus histogram exactly, and the estimates with it."""
    from janet_spark.sketches import (
        hist_counts_frame,
        hist_quantiles_frame,
        incremental_hist_run,
        read_hist_counts,
    )

    rows = [(i, f"t{i % 2}", float((i * 13) % 211) / 4.0) for i in range(600)]
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    path = str(tmp_path / "qhist")
    incremental_hist_run(events.filter("event_id % 3 = 0"), path, "day1")
    incremental_hist_run(events.filter("event_id % 3 != 0"), path, "day2")
    maintained = read_hist_counts(spark, path)
    full = hist_counts_frame(events)
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, full.collect())
    )
    est_m = sorted(map(tuple, hist_quantiles_frame(maintained).collect()))
    est_f = sorted(map(tuple, hist_quantiles_frame(full).collect()))
    assert est_m == est_f


def test_funnel_strictly_after_semantics(spark, tmp_path):
    """Funnel stages require an event STRICTLY AFTER the previous stage:
    a click before (or at the same instant as) signup must not advance,
    and a purchase without an intermediate click must not reach stage 3
    — the degenerate everyone-converts testdata can't pin any of this."""
    from datetime import datetime as DT

    from janet_spark.queries_relational import q_funnel_conversion

    T = lambda m, s=0: DT(2024, 1, 1, 0, m, s)
    rows = [
        # u1: full funnel in order
        (1, T(0), 1, "signup", 1.0, "{}"),
        (2, T(1), 1, "click", 1.0, "{}"),
        (3, T(2), 1, "purchase", 1.0, "{}"),
        # u2: click BEFORE signup, purchase after — stalls at stage 1
        (4, T(0), 2, "click", 1.0, "{}"),
        (5, T(1), 2, "signup", 1.0, "{}"),
        (6, T(2), 2, "purchase", 1.0, "{}"),
        # u3: click at the SAME instant as signup — strictly-after fails
        (7, T(5), 3, "signup", 1.0, "{}"),
        (8, T(5), 3, "click", 1.0, "{}"),
        # u4: signup then click, purchase BEFORE the click — stage 2 only
        (9, T(0), 4, "signup", 1.0, "{}"),
        (10, T(1), 4, "purchase", 1.0, "{}"),
        (11, T(2), 4, "click", 1.0, "{}"),
        # u5: never signs up — outside the funnel entirely
        (12, T(0), 5, "click", 1.0, "{}"),
        (13, T(1), 5, "purchase", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    got = {r.stage: r for r in q_funnel_conversion(spark, sf).collect()}
    assert got["signup"].users == 4  # u1-u4
    assert got["click_after_signup"].users == 2  # u1, u4
    assert got["purchase_after_click"].users == 1  # u1 only
    assert got["purchase_after_click"].conversion_pct == 0.25


def test_funnel_windowed_drops_late_conversions(spark, tmp_path):
    """The 7-day attribution window: a click 8 days after signup (or a
    purchase 8 days after the click) does not advance the funnel, while
    the same sequence inside the window does."""
    import os
    from datetime import datetime as DT

    from janet_spark.queries_relational import q_funnel_windowed

    rows = [
        # u1: signup d1, click d3, purchase d8 (5 days after click) — full
        (1, DT(2024, 1, 1), 1, "signup", 1.0, "{}"),
        (2, DT(2024, 1, 3), 1, "click", 1.0, "{}"),
        (3, DT(2024, 1, 8), 1, "purchase", 1.0, "{}"),
        # u2: signup d1, click d9 (8 days later) — outside the window
        (4, DT(2024, 1, 1), 2, "signup", 1.0, "{}"),
        (5, DT(2024, 1, 9), 2, "click", 1.0, "{}"),
        # u3: signup d1, click d2, purchase d11 (9 days after click)
        (6, DT(2024, 1, 1), 3, "signup", 1.0, "{}"),
        (7, DT(2024, 1, 2), 3, "click", 1.0, "{}"),
        (8, DT(2024, 1, 11), 3, "purchase", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    got = {r.stage: r for r in q_funnel_windowed(spark, sf).collect()}
    assert got["signup"].users == 3
    assert got["click_7d"].users == 2  # u1, u3 — u2's click is 8 days out
    assert got["purchase_7d"].users == 1  # u1 only — u3's purchase 9 days out


def test_maintained_retention_replay_tolerant(spark, tmp_path):
    """Min-merged first-event + distinct-union activity over OVERLAPPING
    deltas (a replayed day) must equal the full-scan statistics exactly —
    the idempotent-merge contract the sum-merge censuses lack."""
    import os
    from datetime import datetime as DT, timedelta

    from janet_spark.dedup_incremental import state_dir_for_input
    from janet_spark.queries_relational import (
        _retention_matrix,
        _retention_week_frames,
        incremental_retention_run,
        read_retention_state,
    )

    rows = [
        (i, DT(2024, 1, 1) + timedelta(days=(i * 3) % 28), i % 40, "view", 1.0, "{}")
        for i in range(400)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    events = spark.read.parquet(f"{sf}/events.parquet")

    fp = state_dir_for_input(sf, "events.parquet", "retention_first")
    ap = state_dir_for_input(sf, "events.parquet", "retention_activity")
    # day2 REPLAYS event_ids 100-199 alongside its fresh rows
    incremental_retention_run(events.filter("event_id < 200"), fp, ap, "day1")
    incremental_retention_run(events.filter("event_id >= 100"), fp, ap, "day2")
    first_m, act_m = read_retention_state(spark, fp, ap)
    first_f, act_f = _retention_week_frames(events)
    got = sorted(map(tuple, _retention_matrix(first_m, act_m).collect()))
    want = sorted(map(tuple, _retention_matrix(first_f, act_f).collect()))
    assert got == want


def test_maintained_retention_no_rebootstrap_after_compaction(spark, tmp_path):
    """After BOTH retention tables are compacted (per-table compacted-<id>
    names never match each other), the constructor must not re-bootstrap:
    the pure-bootstrap gate looks at the UNION of the two tables' names,
    so two compacted tables read as maintained state, not empty state."""
    import os
    from datetime import datetime as DT, timedelta

    from janet_spark.dedup_incremental import (
        _live_generation_dirs,
        compact_generations,
        state_dir_for_input,
    )
    from janet_spark.queries_relational import (
        RETENTION_ACTIVITY_SCHEMA,
        RETENTION_FIRST_SCHEMA,
        _maintained_retention,
    )

    rows = [
        (i, DT(2024, 1, 1) + timedelta(days=i % 21), i % 30, "view", 1.0, "{}")
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")

    _maintained_retention(spark, sf)  # bootstrap
    fp = state_dir_for_input(sf, "events.parquet", "retention_first")
    ap = state_dir_for_input(sf, "events.parquet", "retention_activity")
    compact_generations(spark, fp, RETENTION_FIRST_SCHEMA, keep_latest=0)
    compact_generations(spark, ap, RETENTION_ACTIVITY_SCHEMA, keep_latest=0)
    before = (set(_live_generation_dirs(fp)), set(_live_generation_dirs(ap)))
    _maintained_retention(spark, sf)
    after = (set(_live_generation_dirs(fp)), set(_live_generation_dirs(ap)))
    assert after == before  # no re-bootstrap generations appeared


def test_event_transitions_and_funnel_latency(spark, tmp_path):
    """Transition pairs are PER-USER consecutive (no cross-user pair at
    the partition boundary), probs row-normalize per from_type, and
    funnel latency measures first-signup → first-strictly-later-purchase
    in exact hours."""
    import os
    from datetime import datetime as DT

    from janet_spark.queries_relational import (
        q_event_transitions,
        q_funnel_latency,
    )

    T = lambda h: DT(2024, 1, 1, h)
    rows = [
        # u1: view -> click -> purchase (2 transitions)
        (1, T(0), 1, "view", 1.0, "{}"),
        (2, T(1), 1, "click", 1.0, "{}"),
        (3, T(2), 1, "purchase", 1.0, "{}"),
        # u2: view -> view (1 transition); u1.purchase->u2.view must NOT pair
        (4, T(3), 2, "view", 1.0, "{}"),
        (5, T(4), 2, "view", 1.0, "{}"),
        # u3: signup at h0, purchase at h6 -> 6.0 hours
        (6, T(0), 3, "signup", 1.0, "{}"),
        (7, T(6), 3, "purchase", 1.0, "{}"),
        # u4: signup at h0, purchase at h12 -> 12.0 hours
        (8, T(0), 4, "signup", 1.0, "{}"),
        (9, T(12), 4, "purchase", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")

    trans = {
        (r.from_type, r.to_type): r for r in q_event_transitions(spark, sf).collect()
    }
    assert ("purchase", "view") not in trans  # no cross-user boundary pair
    assert trans[("view", "click")].n == 1
    assert trans[("view", "view")].n == 1
    assert trans[("view", "click")].prob == 0.5  # view row: click + view
    assert trans[("signup", "purchase")].prob == 1.0

    lat = q_funnel_latency(spark, sf).collect()[0]
    assert lat.n_converted == 2
    assert lat.median_hours == 9.0  # interpolated between 6 and 12
    assert lat.p90_hours == 11.4


def test_retention_cohorts_two_cohorts_with_dropout(spark, tmp_path):
    """Two weekly cohorts with a dropout: cohort = week of FIRST event,
    offsets count from that week, pct is against the cohort size."""
    from datetime import datetime as DT

    from janet_spark.queries_relational import q_retention_cohorts

    rows = [
        # cohort A (week of Mon 2024-01-01): u1 active wk0+wk1, u2 wk0 only
        (1, DT(2024, 1, 2), 1, "view", 1.0, "{}"),
        (2, DT(2024, 1, 9), 1, "view", 1.0, "{}"),
        (3, DT(2024, 1, 3), 2, "view", 1.0, "{}"),
        # cohort B (week of Mon 2024-01-08): u3 active wk0+wk2
        (4, DT(2024, 1, 10), 3, "view", 1.0, "{}"),
        (5, DT(2024, 1, 24), 3, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    got = {
        (str(r.cohort_week)[:10], r.week_offset): r
        for r in q_retention_cohorts(spark, sf).collect()
    }
    a0 = got[("2024-01-01", 0)]
    assert a0.active_users == 2 and a0.cohort_size == 2
    a1 = got[("2024-01-01", 1)]
    assert a1.active_users == 1 and a1.retention_pct == 0.5
    b0 = got[("2024-01-08", 0)]
    assert b0.active_users == 1 and b0.cohort_size == 1
    assert ("2024-01-08", 1) not in got  # u3 skipped week 1
    b2 = got[("2024-01-08", 2)]
    assert b2.retention_pct == 1.0


def test_maintained_bootstrap_self_heals_partial_commit(spark, tmp_path):
    """A crash between the two bootstrap generation commits must not be
    read as a complete bootstrap: the constructor checks each generation
    individually and backfills the missing one (the
    ann_ivf_topk_indexed_delta pattern, applied to the HLL/hist/DSIR
    two-generation bootstrappers)."""
    import os

    from janet_spark.dedup_incremental import state_dir_for_input
    from janet_spark.sketches import (
        _maintained_hll_registers,
        hll_registers_frame,
        incremental_hll_run,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    rows = [(i, f"heal key {i}", "en", f"s{i % 2}", 10) for i in range(300)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    # simulate the crash: ONLY gen=bootstrap (even doc_ids) committed
    reg_path = state_dir_for_input(sf, "documents.parquet", "hll_registers")
    incremental_hll_run(
        spark.read.parquet(f"{sf}/documents.parquet").filter("doc_id % 2 = 0"),
        reg_path,
        "bootstrap",
    )
    healed = _maintained_hll_registers(spark, sf)
    full = hll_registers_frame(spark.read.parquet(f"{sf}/documents.parquet"))
    assert sorted(map(tuple, healed.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_maintained_hist_survives_compaction_without_rebootstrap(spark, tmp_path):
    """After compact_generations absorbs the bootstrap halves under
    gen=compacted-*, the maintained constructor must NOT re-write them:
    for a sum-merged table that would double every count. The backfill
    is gated on the state still being pure-bootstrap-shaped."""
    import os

    from janet_spark.dedup_incremental import (
        compact_generations,
        state_dir_for_input,
    )
    from janet_spark.sketches import (
        HIST_SCHEMA,
        _maintained_hist,
        hist_counts_frame,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    rows = [(i, f"t{i % 2}", float((i * 7) % 101) / 2.0) for i in range(400)]
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    events.write.mode("overwrite").parquet(f"{sf}/events.parquet")

    before = sorted(map(tuple, _maintained_hist(spark, sf).collect()))
    hist_path = state_dir_for_input(sf, "events.parquet", "quantile_hist")
    compact_generations(spark, hist_path, HIST_SCHEMA, keep_latest=0)
    after = sorted(map(tuple, _maintained_hist(spark, sf).collect()))
    full = sorted(
        map(
            tuple,
            hist_counts_frame(spark.read.parquet(f"{sf}/events.parquet")).collect(),
        )
    )
    assert before == full
    assert after == full  # NOT doubled


def test_dsir_maintained_counts_equal_full_scan(spark, tmp_path):
    """The summed count generations must equal the full-corpus classifier
    (occurrences partition by doc_id across deltas), and the maintained
    scorer must reproduce the standalone scores for the delta exactly."""
    from janet_spark.dedup_incremental import (
        dsir_counts_of,
        incremental_dsir_counts_run,
        read_dsir_counts,
    )
    from janet_spark.queries_relational import t
    from janet_spark.queries_text import (
        _dsir_feature_occurrences,
        _dsir_ratio_from_counts,
        _dsir_score,
        dsir_importance_frame,
    )

    docs = t(spark, _SF, "documents")
    path = str(tmp_path / "dsir_counts")
    occ_h = _dsir_feature_occurrences(docs.filter(F.col("doc_id") % 2 == 0))
    occ_d = _dsir_feature_occurrences(docs.filter(F.col("doc_id") % 2 == 1))
    incremental_dsir_counts_run(occ_h, path, "bootstrap")
    incremental_dsir_counts_run(occ_d, path, "delta-day2")
    summed = read_dsir_counts(spark, path).orderBy("bucket").collect()
    full = (
        dsir_counts_of(_dsir_feature_occurrences(docs)).orderBy("bucket").collect()
    )
    assert [tuple(r) for r in summed] == [tuple(r) for r in full]

    maintained = (
        _dsir_score(occ_d, _dsir_ratio_from_counts(read_dsir_counts(spark, path)))
        .orderBy("doc_id")
        .collect()
    )
    standalone = (
        dsir_importance_frame(docs)
        .filter(F.col("doc_id") % 2 == 1)
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in maintained] == [tuple(r) for r in standalone]
