"""Unit tests for the quality / chunking / search / PII operator family."""

import math

import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.chunking import chunk_documents
from smart_data_lake_spark.functions.quality import (
    duplicate_line_fraction,
    duplicate_ngram_fraction,
    ngrams,
    top_ngram_fraction,
    with_repetition_stats,
)
from smart_data_lake_spark.functions.search import bm25_topk, tfidf_vectors
from smart_data_lake_spark.functions.text import redact_pii


def test_ngram_run_stats_against_hand_count(spark):
    # "the cat sat on the cat sat on a mat": 9 bigrams, "the cat"/"cat sat"/
    # "sat on" each twice -> best run 2, six bigrams belong to dup groups
    df = spark.createDataFrame([("the cat sat on the cat sat on a mat",)], ["text"])
    row = df.select(
        F.size(ngrams(F.col("text"), 2)).alias("n2"),
        top_ngram_fraction(F.col("text"), 2).alias("top2"),
        duplicate_ngram_fraction(F.col("text"), 2).alias("dup2"),
    ).first()
    assert row.n2 == 9
    assert row.top2 == pytest.approx(2 / 9)
    assert row.dup2 == pytest.approx(6 / 9)


def test_ngram_shorter_than_n_is_empty(spark):
    df = spark.createDataFrame([("one two",), ("",)], ["text"])
    rows = df.select(F.size(ngrams(F.col("text"), 3)).alias("n")).collect()
    assert [r.n for r in rows] == [0, 0]


def test_duplicate_line_fraction(spark):
    text = "alpha\nbeta\nalpha\n\n  beta  \ngamma"
    df = spark.createDataFrame([(text,)], ["text"])
    # trimmed non-empty lines: alpha beta alpha beta gamma -> 2 of 5 are dups
    assert df.select(duplicate_line_fraction(F.col("text")).alias("f")).first().f == pytest.approx(2 / 5)


def test_repetition_stats_flags_repeated_doc(spark):
    clean = "the quick brown fox jumps over a lazy dog near the river bank today"
    spammy = " ".join(["buy now"] * 30)
    df = spark.createDataFrame([(1, clean), (2, spammy)], ["doc_id", "text"])
    rows = {r.doc_id: r for r in with_repetition_stats(df).collect()}
    assert rows[1].quality_keep is True
    assert rows[2].quality_keep is False
    assert rows[2].top_2gram_frac > 0.4
    assert rows[2].dup_5gram_frac == pytest.approx(1.0)


def test_chunking_covers_text_exactly(spark):
    text = "x" * 250
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_chars=100, overlap=20).orderBy("chunk_id").collect()
    # stride 80: starts 1, 81, 161 -> 3 chunks; last one short (90 chars)
    assert [r.chunk_start for r in rows] == [1, 81, 161]
    assert [len(r.chunk_text) for r in rows] == [100, 100, 90]
    assert all(r.n_chunks == 3 for r in rows)
    # overlapping reassembly reproduces the document
    rebuilt = rows[0].chunk_text + "".join(r.chunk_text[20:] for r in rows[1:])
    assert rebuilt == text


def test_chunking_short_and_empty_docs(spark):
    df = spark.createDataFrame([(1, "short"), (2, "")], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_chars=100, overlap=20).collect()
    by_id = {r.doc_id: r for r in rows}
    assert len(rows) == 2  # one chunk each, nothing dropped
    assert by_id[1].chunk_text == "short"
    assert by_id[2].chunk_text == ""


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=50, overlap=50)


def test_bm25_matches_reference_formula(spark):
    docs = [
        (1, "spark merge window"),
        (2, "merge merge merge stream"),
        (3, "window scan sort"),
        (4, "nothing relevant here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in bm25_topk(df, ["merge", "window"], k=4).collect()}
    assert 4 not in out  # no query term
    assert out[2].n_matched == 1 and out[1].n_matched == 2

    # independent python reference for doc 1
    n, k1, b = 4, 1.2, 0.75
    dls = {1: 3, 2: 4, 3: 3, 4: 3}
    avgdl = sum(dls.values()) / n
    def idf(dfreq):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
    def term(tf, dfreq, dl):
        return idf(dfreq) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    expected = term(1, 2, 3) + term(1, 2, 3)  # merge df=2, window df=2
    assert out[1].score == pytest.approx(expected, abs=1e-6)


def test_tfidf_vectors_shape_and_zero_for_absent_terms(spark):
    df = spark.createDataFrame([(1, "spark spark window"), (2, "scan")], ["doc_id", "text"])
    rows = {r.doc_id: r.tfidf for r in tfidf_vectors(df, ["spark", "window", "merge"]).collect()}
    assert len(rows[1]) == 3
    assert rows[1][2] == 0.0  # merge absent
    assert rows[2][0] == 0.0 and rows[1][0] > rows[1][1]  # tf weighting


def test_redact_pii_all_kinds(spark):
    text = "mail a.b+c@x-corp.io call 555-123-4567 ssn 123-45-6789 host 192.168.0.1 end"
    df = spark.createDataFrame([(text,)], ["text"])
    red = df.select(redact_pii(F.col("text")).alias("r")).first().r
    assert red == "mail <EMAIL> call <PHONE> ssn <SSN> host <IP> end"


def test_redact_pii_leaves_clean_text_alone(spark):
    text = "no pii here just words and 42 numbers"
    df = spark.createDataFrame([(text,)], ["text"])
    assert df.select(redact_pii(F.col("text")).alias("r")).first().r == text


def test_bpe_ish_token_count_segments(spark):
    from smart_data_lake_spark.functions.text import bpe_ish_token_count

    df = spark.createDataFrame([("it's 42 well-known facts!",)], ["text"])
    # "it" "'s" " 42" " well" "-" "known" " facts" "!" -> 8 pre-tokens
    assert df.select(bpe_ish_token_count(F.col("text")).alias("n")).first().n == 8


def test_multimodal_real_decoders_distributed(spark):
    """BMP and WAV decode REALLY execute (stdlib codecs, no external libs)
    inside an Arrow-batched mapInPandas — payloads never reach the driver;
    unknown formats fall through to the declared stub."""
    import io
    import json
    import struct
    import wave

    from pyspark.sql import Row

    from smart_data_lake_spark.functions.multimodal import decode_media

    # real 2x2 24-bit BMP
    row = bytes([10, 20, 30, 40, 50, 60]) + b"\x00\x00"
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(row) * 2, 2835, 2835, 0, 0)
    bmp = b"BM" + struct.pack("<IHHI", 54 + len(row) * 2, 0, 0, 54) + info + row * 2
    # real PCM WAV via the stdlib writer
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(struct.pack("<4h", 1000, -1000, 1000, -1000))
    wav = buf.getvalue()

    df = spark.createDataFrame(
        [Row(name="img", payload=bytearray(bmp)), Row(name="aud", payload=bytearray(wav)),
         Row(name="other", payload=bytearray(b"\x89PNG....fake"))],
        "name string, payload binary",
    )

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {"name": pdf["name"],
                 "meta": [json.dumps(decode_media(bytes(p))) for p in pdf["payload"]]}
            )

    out = {r["name"]: json.loads(r["meta"])
           for r in df.mapInPandas(_decode, "name string, meta string").collect()}
    assert out["img"] == {"width": 2, "height": 2, "channels": 3, "format": "bmp",
                          "mean_rgb": [45.0, 35.0, 25.0]}
    assert out["aud"]["sample_rate"] == 8000 and out["aud"]["rms"] == 1000.0
    assert out["other"]["format"] == "stub"  # undecodable → declared stub


# ------------------------------------------------------------- PNG (r6, real)


def _png_encode(width, height, pixels, color_type=2, filters=None, palette=None):
    """Tiny forward PNG encoder for tests: `pixels` is rows of per-channel
    byte tuples; `filters` picks the per-row filter type to exercise the
    decoder's unfilter paths (RFC 2083 §6)."""
    import struct
    import zlib

    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    stride = width * nch
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        flat = bytearray()
        for px in pixels[y]:
            flat.extend(px if isinstance(px, (tuple, list)) else (px,))
        assert len(flat) == stride
        ftype = (filters or [0] * height)[y]
        enc = bytearray(flat)
        if ftype == 1:
            for i in range(stride - 1, nch - 1, -1):
                enc[i] = (flat[i] - flat[i - nch]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (flat[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = flat[i - nch] if i >= nch else 0
                enc[i] = (flat[i] - (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = flat[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (flat[i] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(enc)
        prev = bytearray(flat)

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    return out


def test_png_decode_rgb_all_filter_types():
    from smart_data_lake_spark.functions.multimodal import decode_png

    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)],
        [(5, 5, 5), (250, 250, 250), (1, 2, 3), (100, 110, 120)],
        [(9, 8, 7), (6, 5, 4), (3, 2, 1), (0, 0, 0)],
        [(40, 40, 40), (41, 41, 41), (42, 42, 42), (43, 43, 43)],
        [(200, 100, 50), (200, 100, 50), (200, 100, 50), (200, 100, 50)],
    ]
    data = _png_encode(4, 5, pixels, color_type=2, filters=[0, 1, 2, 3, 4])
    out = decode_png(data)
    assert (out["width"], out["height"], out["channels"]) == (4, 5, 3)
    flat = [px for row in pixels for px in row]
    for ch in range(3):
        expect = round(sum(p[ch] for p in flat) / len(flat), 3)
        assert out["mean_channels"][ch] == expect


def test_png_decode_gray_and_rgba_and_palette():
    from smart_data_lake_spark.functions.multimodal import decode_png

    gray = _png_encode(3, 2, [[(0,), (128,), (255,)], [(10,), (20,), (30,)]],
                       color_type=0, filters=[4, 2])
    g = decode_png(gray)
    assert g["channels"] == 1
    assert g["mean_channels"] == [round((0 + 128 + 255 + 10 + 20 + 30) / 6, 3)]

    rgba = _png_encode(2, 1, [[(1, 2, 3, 255), (5, 6, 7, 128)]], color_type=6, filters=[1])
    a = decode_png(rgba)
    assert a["channels"] == 4
    assert a["mean_channels"] == [3.0, 4.0, 5.0, round((255 + 128) / 2, 3)]

    pal = [255, 0, 0, 0, 255, 0]  # index0=red, index1=green
    p = _png_encode(2, 2, [[(0,), (1,)], [(1,), (1,)]], color_type=3,
                    filters=[0, 1], palette=pal)
    pd_ = decode_png(p)
    assert pd_["channels"] == 3
    assert pd_["mean_channels"] == [round(255 / 4, 3), round(3 * 255 / 4, 3), 0.0]


def _png_encode_adam7(width, height, pixels, nch=3):
    """Interlaced (Adam7) forward encoder: seven filter-0 passes."""
    import struct
    import zlib

    raw = bytearray()
    for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                           (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)):
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for j in range(ph):
            raw.append(0)  # filter None
            for i in range(pw):
                raw.extend(pixels[y0 + j * dy][x0 + i * dx])

    def chunk(ctype, body):
        b = ctype + body
        return struct.pack(">I", len(body)) + b + struct.pack(">I", zlib.crc32(b))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_adam7_interlaced_decodes_for_real():
    from smart_data_lake_spark.functions.multimodal import decode_media, decode_png

    pixels = [[(x * 10, y * 20, x + y) for x in range(5)] for y in range(3)]
    data = _png_encode_adam7(5, 3, pixels)
    out = decode_png(data)
    assert out["interlaced"] is True
    assert (out["width"], out["height"], out["channels"]) == (5, 3, 3)
    flat = [px for row in pixels for px in row]
    for ch in range(3):
        assert out["mean_channels"][ch] == round(sum(p[ch] for p in flat) / len(flat), 3)
    assert decode_media(data)["format"] == "png"


def test_png_dispatch_and_unsupported_fallback():
    import struct
    import zlib

    from smart_data_lake_spark.functions.multimodal import decode_media, decode_png

    data = _png_encode(2, 2, [[(1, 1, 1), (2, 2, 2)], [(3, 3, 3), (4, 4, 4)]])
    assert decode_media(data)["format"] == "png"
    # 16-bit depth -> clear error from decode_png, stub via decode_media
    def chunk(ctype, body):
        b = ctype + body
        return struct.pack(">I", len(body)) + b + struct.pack(">I", zlib.crc32(b))

    deep = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 26)) + chunk(b"IEND", b""))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bit depth"):
        decode_png(deep)
    assert decode_media(deep)["format"] == "stub"


def test_extract_image_features_real_png_pipeline(spark, tmp_path):
    """binaryFile scan -> mapInPandas with the REAL stdlib PNG codec: the
    decode happens executor-side and the driver sees only typed metadata."""
    from smart_data_lake_spark.functions.multimodal import decode_media, extract_image_features

    for i in range(3):
        w = 2 + i
        pixels = [[(i * 10, i * 20 % 256, i * 30 % 256)] * w for _ in range(4)]
        (tmp_path / f"img{i}.png").write_bytes(
            _png_encode(w, 4, pixels, color_type=2, filters=[0, 1, 2, 4])
        )
    binf = spark.read.format("binaryFile").option("pathGlobFilter", "*.png").load(str(tmp_path))
    out = extract_image_features(binf, decoder=decode_media).collect()
    metas = {r["path"].rsplit("/", 1)[-1]: r["meta"] for r in out}
    assert len(metas) == 3
    for i in range(3):
        m = metas[f"img{i}.png"]
        assert m["format"] == "png"
        assert (m["width"], m["height"], m["channels"]) == (2 + i, 4, 3)
