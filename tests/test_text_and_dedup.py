"""Tests for text-analysis kernels, dedup family, ANN, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from biosample_enricher_ray.functions.textstats import (
    detect_language,
    quality_features,
    regex_token_count,
    rolling_fingerprint,
    whitespace_token_count,
)
from biosample_enricher_ray.stages.ann import brute_force_topk, embedding_near_dup_pairs
from biosample_enricher_ray.stages.dedup import (
    exact_dedup_groups,
    minhash_lsh_candidates,
    ngram_jaccard,
    simhash_near_dups,
    verify_pairs_ngram_jaccard,
)
from biosample_enricher_ray.stages.multimodal import AudioFrameSampler, ImageDecoder


def test_token_counts():
    t = pa.array(["one two  three", "", None, " a "])
    assert whitespace_token_count(t).to_pylist() == [3, 0, 0, 1]
    r = regex_token_count(pa.array(["it's 42, ok!"]))
    # it's | 42 | , | ok | !  → 5
    assert r.to_pylist() == [5]


def test_quality_features():
    q = quality_features(
        pa.array([
            "The quick brown fox jumps over the lazy dog and runs to the old barn in town.",
            "@@@### !!! ???",
            "",
        ])
    )
    scores = q["quality_score"].to_pylist()
    assert scores[0] > 50
    assert scores[1] < 30
    assert scores[2] == 0.0
    assert q["n_tokens"].to_pylist()[0] == 17


def test_detect_language():
    out = detect_language(
        pa.array([
            "the cat is on the mat and it was a good day for all of us",
            "der hund ist nicht in der küche und das ist ein problem",
            "le chat est dans la maison et il est pas content pour le moment",
            "zzz qqq www",
            "",
        ])
    )
    assert out.to_pylist() == ["en", "de", "fr", "und", None]


def test_rolling_fingerprint_stable():
    a = rolling_fingerprint(pa.array(["hello world document", "hello world document", "other"]))
    assert a[0] == a[1] and a[0] != a[2]


def test_exact_dedup_groups():
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "aaa"},
            {"doc_id": 2, "text": "bbb"},
            {"doc_id": 3, "text": "aaa"},
            {"doc_id": 4, "text": "aaa"},
        ]
    )
    out = exact_dedup_groups(ds).to_pandas().sort_values("keep_id").reset_index(drop=True)
    assert out.to_dict("records") == [
        {"keep_id": 1, "n": 3},
        {"keep_id": 2, "n": 1},
    ]


def test_exact_dedup_groups_with_empty_blocks():
    """A filter that empties whole blocks must not crash the key shuffle
    (round-3 driver crash: schema-less empty block -> KeyError 'h' in
    bucketize, stages/dedup.py). Blocks 2+ are emptied entirely."""
    ds = ray.data.from_items(
        [{"doc_id": i, "text": "dup" if i < 3 else f"only-{i}"}
         for i in range(40)],
        override_num_blocks=8,
    )

    def gate(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.less(t["doc_id"], 5))
        return pa.table({"doc_id": kept["doc_id"], "text": kept["text"]})

    filtered = ds.map_batches(gate, batch_format="pyarrow")
    out = exact_dedup_groups(filtered).to_pandas().sort_values(
        "keep_id").reset_index(drop=True)
    assert out.to_dict("records") == [
        {"keep_id": 0, "n": 3},
        {"keep_id": 3, "n": 1},
        {"keep_id": 4, "n": 1},
    ]


def test_exact_dedup_groups_gated_single_gate_scan():
    """exact_dedup_groups_gated matches dedup-over-filtered semantics, with
    the gate also applied on the candidate re-scan (a hash-matching row that
    fails the gate must not join the group)."""
    from biosample_enricher_ray.stages.dedup import exact_dedup_groups_gated

    rows = (
        [{"doc_id": i, "text": "dup", "lang": "en"} for i in range(3)]
        + [{"doc_id": 3, "text": "dup", "lang": "fr"}]  # same text, gated out
        + [{"doc_id": 4 + i, "text": f"u{i}", "lang": "en"} for i in range(4)]
        + [{"doc_id": 8, "text": "u0", "lang": "de"}]  # gated-out dup of u0
    )

    def make_source():
        return ray.data.from_items(rows, override_num_blocks=4)

    def gate(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.equal(t["lang"], "en"))
        return pa.table({"doc_id": kept["doc_id"], "text": kept["text"]})

    out = exact_dedup_groups_gated(make_source, gate).to_pandas()
    out = out.sort_values("keep_id").reset_index(drop=True)
    assert out.to_dict("records") == [
        {"keep_id": 0, "n": 3},
        {"keep_id": 4, "n": 1},
        {"keep_id": 5, "n": 1},
        {"keep_id": 6, "n": 1},
        {"keep_id": 7, "n": 1},
    ]


BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets slowly "
    "behind the old mountain range and the river flows gently through the "
    "green valley toward the distant sea under a pale evening sky"
)


def _near_dup_docs():
    rows = [
        {"doc_id": 0, "text": BASE},
        {"doc_id": 1, "text": BASE.replace("lazy", "sleepy")},  # near-dup of 0
        {"doc_id": 2, "text": BASE},  # exact dup of 0
        {"doc_id": 3, "text": "completely different content about databases and "
                              "distributed systems with columnar storage engines "
                              "and vectorized execution kernels for analytics"},
        {"doc_id": 4, "text": "short unrelated note"},
    ]
    return ray.data.from_items(rows)


def test_minhash_lsh_finds_near_dups():
    pairs = minhash_lsh_candidates(
        _near_dup_docs(), jaccard_threshold=0.5, concurrency=2
    ).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 2) in got  # exact dup
    assert (0, 1) in got and (1, 2) in got  # near dup
    assert all(3 not in p and 4 not in p for p in got)

    verified = verify_pairs_ngram_jaccard(_near_dup_docs(), pairs)
    v02 = verified.set_index(["id_a", "id_b"]).loc[(0, 2), "jaccard"]
    assert v02 == 1.0


def test_simhash_near_dups():
    pairs = simhash_near_dups(_near_dup_docs(), max_hamming=3, concurrency=2).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 2) in got
    assert all(3 not in p and 4 not in p for p in got)


def test_ngram_jaccard_exact():
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0
    assert ngram_jaccard("", "") == 1.0
    assert 0 < ngram_jaccard("a b c d e", "a b c d x") < 1


def test_brute_force_topk_matches_numpy(sf001_dir):
    ds = ray.data.read_parquet(f"{sf001_dir}/embeddings.parquet")
    pdf = ds.to_pandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    q = mat[:3]
    got = brute_force_topk(ds, q, k=5, concurrency=2)

    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = mn @ qn.T
    for qi in range(3):
        expect = set(pdf["vec_id"].to_numpy()[np.argsort(-sims[:, qi])[:5]])
        have = set(got[got["query_id"] == qi]["vec_id"])
        assert have == expect
        # self is rank 0 with score ~1
        top = got[(got["query_id"] == qi) & (got["rank"] == 0)].iloc[0]
        assert top["vec_id"] == pdf["vec_id"][qi]
        assert abs(top["score"] - 1.0) < 1e-5


def test_embedding_near_dups():
    rng = np.random.default_rng(9)
    base = rng.standard_normal(16).astype(np.float32)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base + 0.01 * rng.standard_normal(16)).astype(np.float32).tolist()},
        {"vec_id": 2, "embedding": rng.standard_normal(16).tolist()},
    ]
    ds = ray.data.from_items(rows)
    pairs = embedding_near_dup_pairs(ds, dim=16, threshold=0.99, concurrency=2).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert got == {(0, 1)}


def _png_bytes(w: int, h: int, color_type: int = 6) -> bytes:
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, color_type, 0, 0, 0]))
    return (b"\x89PNG\r\n\x1a\n" + len(ihdr).to_bytes(4, "big") + b"IHDR"
            + ihdr + b"\x00" * 8)


def _jpeg_bytes(w: int, h: int) -> bytes:
    # SOI, APP0 segment, SOF0 with dims, filler
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03")
    return b"\xff\xd8" + app0 + sof0 + b"\x00" * 16


def test_image_decoder_parses_real_headers():
    """Real codec-free header parsing: PNG IHDR, JPEG SOF0 marker walk, GIF
    screen descriptor; garbage/null payloads get decode_ok=False (corrupt
    rows are data, not errors)."""
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 6
    rows = [
        {"doc_id": 1, "payload": _png_bytes(640, 480)},
        {"doc_id": 2, "payload": _jpeg_bytes(1920, 1080)},
        {"doc_id": 3, "payload": gif},
        {"doc_id": 4, "payload": b"\x01\x02\x03\x04" * 100},  # garbage
        {"doc_id": 5, "payload": None},
    ]
    ds = ray.data.from_items(rows)
    out = ds.map_batches(
        ImageDecoder, fn_constructor_kwargs=dict(payload_column="payload"),
        batch_format="pyarrow", batch_size=64, concurrency=2,
    ).to_pandas().set_index("doc_id")
    assert out.loc[1, ["width", "height", "format"]].tolist() == [640, 480, "png"]
    assert out.loc[1, "n_channels"] == 4  # color type 6 = RGBA
    assert out.loc[2, ["width", "height", "format"]].tolist() == [1920, 1080, "jpeg"]
    assert out.loc[3, ["width", "height", "format"]].tolist() == [320, 200, "gif"]
    assert not out.loc[4, "decode_ok"] and not out.loc[5, "decode_ok"]
    assert out.loc[[1, 2, 3], "decode_ok"].all()


def test_audio_frame_sampler_real_dsp():
    """Raw-PCM framing with real per-frame features: a constant payload has
    zero RMS/ZCR after midpoint centering... (constant 128 = silence), an
    alternating payload maximizes ZCR."""
    silence = bytes([128]) * 8192          # 2 frames of exact midpoint
    alternating = bytes([0, 255]) * 2048   # 1 frame, max swing
    ds = ray.data.from_items([
        {"doc_id": 1, "payload": silence},
        {"doc_id": 2, "payload": alternating},
        {"doc_id": 3, "payload": None},
    ])
    frames = ds.map_batches(
        AudioFrameSampler, fn_constructor_kwargs=dict(payload_column="payload"),
        batch_format="pyarrow", batch_size=64, concurrency=2,
    ).to_pandas()
    s = frames[frames["doc_id"] == 1]
    assert len(s) == 2 and (s["rms"] == 0.0).all() and (s["zcr"] == 0.0).all()
    a = frames[frames["doc_id"] == 2].iloc[0]
    assert a["peak"] == 1.0 and a["zcr"] > 0.99 and a["rms"] > 0.9
    assert 3 not in set(frames["doc_id"])


def test_multimodal_zero_copy_payload_access():
    """Round-4 VERDICT ask #5: no full-payload to_pylist in either stage.

    Equality vs the previous full-copy semantics: ImageDecoder must parse a
    multi-MB payload identically when only the 64 KiB header prefix is
    sliced, and AudioFrameSampler's Arrow-buffer-view framing must equal
    per-row np.frombuffer on the Python bytes — including on a SLICED
    (non-zero offset) array, the case buffer math gets wrong."""
    big_png = _png_bytes(123, 45) + b"\x00" * (2 << 20)  # 2 MiB tail
    app_seg = b"\xff\xe1" + (40_002).to_bytes(2, "big") + b"\x00" * 40_000
    late_sof = (b"\xff\xd8" + app_seg + app_seg
                + b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
                + (9).to_bytes(2, "big") + (7).to_bytes(2, "big") + b"\x03")
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "payload": pa.array([big_png, late_sof, None, b""], pa.binary()),
    })
    out = ImageDecoder()(t).to_pandas().set_index("doc_id")
    assert out.loc[0, ["width", "height", "format"]].tolist() == [123, 45, "png"]
    # SOF past the 64 KiB header window (multi-segment EXIF/ICC metadata):
    # the per-row full-payload fallback must still recover the dimensions —
    # only the zero-copy prefix FAST path stops at 64 KiB
    assert out.loc[1, "decode_ok"]
    assert out.loc[1, ["width", "height", "format"]].tolist() == [7, 9, "jpeg"]
    assert not out.loc[2, "decode_ok"] and not out.loc[3, "decode_ok"]

    rng = np.random.default_rng(11)
    payloads = [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
                for n in (10_000, 4096, 1, 5000)] + [None, b""]
    ids = list(range(len(payloads)))
    arr_ids = pa.array(ids, pa.int64())
    arr_pay = pa.array(payloads, pa.binary())
    sampler = AudioFrameSampler(frame_bytes=4096)
    whole = sampler(pa.table({"doc_id": arr_ids, "payload": arr_pay})
                    ).to_pandas()
    part = sampler(pa.table({"doc_id": arr_ids.slice(1, 4),
                             "payload": arr_pay.slice(1, 4)})).to_pandas()
    pd.testing.assert_frame_equal(
        part.reset_index(drop=True),
        whole[whole["doc_id"].isin([1, 2, 3, 4])].reset_index(drop=True))
    # oracle: per-row bytes-copy framing
    exp_rows = []
    for rid, b in zip(ids, payloads):
        if not b:
            continue
        arr = np.frombuffer(b, np.uint8).astype(np.float64) - 128.0
        for f in range(max(1, -(-len(arr) // 4096))):
            seg = arr[f * 4096:(f + 1) * 4096]
            sign = np.signbit(seg)
            exp_rows.append((rid, f,
                             float(np.sqrt(np.mean(seg * seg))) / 128.0,
                             np.count_nonzero(sign[1:] != sign[:-1])
                             / max(len(seg) - 1, 1),
                             float(np.max(np.abs(seg))) / 128.0))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "frame", "rms", "zcr",
                                          "peak"])
    got = whole.astype({"rms": float, "zcr": float, "peak": float})
    np.testing.assert_allclose(
        got[["rms", "zcr", "peak"]].to_numpy(),
        exp[["rms", "zcr", "peak"]].to_numpy(), rtol=1e-6)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["frame"].tolist() == exp["frame"].tolist()


def test_binary_features_phash_locality():
    """byte_phash is deterministic, identical for identical payloads, and
    closer (Hamming) for a 1-byte-perturbed copy than for unrelated bytes."""
    from biosample_enricher_ray.stages.multimodal import BinaryFeatures

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    near = bytearray(base)
    near[100] = (near[100] + 1) % 256  # tiny perturbation
    far = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "payload": pa.array([base, base, bytes(near), far],
                                      pa.binary())})
    out = BinaryFeatures()(t).to_pandas()
    ph = out["byte_phash"].to_numpy(dtype=np.int64).view(np.uint64)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ph[0] == ph[1]                      # deterministic
    assert ham(ph[0], ph[2]) <= 8              # near-dup stays close
    assert ham(ph[0], ph[3]) > ham(ph[0], ph[2])  # unrelated is farther


def test_token_hashes_handle_sliced_arrays():
    """Sliced Arrow arrays (offset > 0, or buffer extending past the slice)
    must fingerprint identically to the compacted copy — a slice's offsets
    point into the parent data buffer."""
    import pyarrow as pa

    from biosample_enricher_ray.stages.dedup import simhash_column, MinHasher

    texts = ["alpha beta gamma delta", "the quick brown fox", "lorem ipsum dolor",
             "x y z", "tail bytes here"]
    full = pa.array(texts, pa.string())
    want = simhash_column(full)
    for start, length in [(1, 2), (0, 2), (2, 3), (4, 1)]:
        sl = full.slice(start, length)
        got = simhash_column(sl)
        assert list(got) == list(want[start : start + length]), (start, length)
    mh = MinHasher()
    sig_full, _ = mh.batch_signatures(full)
    for start, length in [(1, 3), (0, 3)]:
        sig_sl, _ = mh.batch_signatures(full.slice(start, length))
        assert (sig_sl == sig_full[start : start + length]).all()


def test_exact_dedup_shuffles_keys_only(sf001_dir):
    """The exact-dedup exchange must move int64 (hash, id) pairs only —
    never text. Asserted on the REAL map-task payload builder."""
    import pyarrow.parquet as pq

    from biosample_enricher_ray.functions.hashing import hash64
    from biosample_enricher_ray.stages.dedup import exact_dedup_map_payload

    t = pq.read_table(f"{sf001_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    parts = exact_dedup_map_payload(t, "text", "doc_id", hash64,
                                    num_buckets=8, shift=np.uint64(61))
    assert len(parts) == 8
    total = 0
    for p in parts:
        assert p.dtype == np.int64 and p.ndim == 2 and p.shape[1] == 2
        total += len(p)
    assert total == len(t)  # every row shipped, 16 bytes each


def test_exact_dedup_survives_hash_collisions(ray_session):
    """With a pathological constant hash (every text collides), the candidate
    pass must still produce the exact per-text groups."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from biosample_enricher_ray.stages.dedup import exact_dedup_groups

    texts = ["aa", "bb", "aa", "cc", "bb", "aa", None, None, "dd"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)

    def constant_hash(col):
        return np.zeros(len(col), dtype=np.uint64)

    out = exact_dedup_groups(ds, hash_fn=constant_hash).to_pandas()
    out = out.sort_values("keep_id").reset_index(drop=True)
    want = pd.DataFrame({"keep_id": [0, 1, 3, 6, 8], "n": [3, 2, 1, 2, 1]})
    pd.testing.assert_frame_equal(out, want)


def test_minhash_dedup_clusters_planted():
    """Planted ground truth: {0,1,2} near-dup cluster with keeper 0; docs 3,4
    unclustered (absent). Keeper rows carry doc_id == keeper_id."""
    from biosample_enricher_ray.stages.dedup import minhash_dedup_clusters

    out = minhash_dedup_clusters(_near_dup_docs(), jaccard_threshold=0.5,
                                 concurrency=2)
    assert out.columns.tolist() == ["doc_id", "keeper_id", "cluster_size"]
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["keeper_id"].tolist() == [0, 0, 0]
    assert out["cluster_size"].tolist() == [3, 3, 3]


def test_minhash_star_edges_cap_keeps_connectivity():
    """A bucket over max_group_size emits star edges: clusters stay connected
    through the min-id anchor even without the O(m^2) pair list."""
    from biosample_enricher_ray.stages.dedup import minhash_dedup_clusters

    rows = [{"doc_id": i, "text": BASE} for i in range(12)]  # one giant bucket
    rows.append({"doc_id": 99, "text": "totally different text about nothing"})
    ds = ray.data.from_items(rows)
    out = minhash_dedup_clusters(ds, jaccard_threshold=0.5, max_group_size=4,
                                 concurrency=2)
    assert out["doc_id"].tolist() == list(range(12))
    assert (out["keeper_id"] == 0).all()
    assert (out["cluster_size"] == 12).all()


def test_rolling_fingerprint_matches_reference_rows():
    """The vectorized flat-buffer kernel must reproduce the original per-row
    definition exactly (min of rolling polynomial hashes, FNV fold for short
    docs), including unicode, short, empty and null rows."""
    from numpy.lib.stride_tricks import sliding_window_view

    def reference_one(t, window=8):
        if not t:
            return 0
        B = np.uint64(1099511628211)
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if b.size < window:
            acc = np.uint64(14695981039346656037)
            for x in b:
                acc = np.uint64((int(acc) * int(B) ^ int(x)) & 0xFFFFFFFFFFFFFFFF)
            return int(acc.view(np.int64))
        powers = np.empty(window, dtype=np.uint64)
        powers[0] = np.uint64(1)
        for k in range(1, window):
            powers[k] = np.uint64((int(powers[k - 1]) * int(B)) & 0xFFFFFFFFFFFFFFFF)
        wins = sliding_window_view(b, window)
        with np.errstate(over="ignore"):
            hashes = (wins * powers[::-1]).sum(axis=1, dtype=np.uint64)
        return int(hashes.min().view(np.int64))

    texts = ["hello world document", "short", "", None, "héllo wörld ünïcode text",
             "a", "exactly8", "exactly8b", BASE, "  spaces  padded  "]
    got = rolling_fingerprint(pa.array(texts, pa.string())).to_pylist()
    want = [0 if t is None else reference_one(t) for t in texts]
    assert got == want
    # sliced input agrees too
    arr = pa.array(texts, pa.string())
    got_sl = rolling_fingerprint(arr.slice(2, 5)).to_pylist()
    assert got_sl == want[2:7]


def test_ivf_topk_recall_and_determinism(sf001_dir):
    """IVF top-k: self-match at rank 0, decent recall vs brute force on the
    shared embeddings, identical output across invocations (fixed seed)."""
    import ray.data

    from biosample_enricher_ray.stages.ann import brute_force_topk, ivf_topk

    ds = ray.data.read_parquet(f"{sf001_dir}/embeddings.parquet")
    pdf = ds.to_pandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    q = mat[:3]
    exact = brute_force_topk(ds, q, k=10, concurrency=2)
    approx = ivf_topk(ds, q, k=10, n_centroids=16, n_probe=4, concurrency=2)
    approx2 = ivf_topk(ds, q, k=10, n_centroids=16, n_probe=4, concurrency=2)
    pd.testing.assert_frame_equal(approx, approx2)  # deterministic
    for qi in range(3):
        ex = set(exact[exact["query_id"] == qi]["vec_id"])
        ap = set(approx[approx["query_id"] == qi]["vec_id"])
        recall = len(ex & ap) / len(ex)
        assert recall >= 0.5, (qi, recall)
        top = approx[(approx["query_id"] == qi) & (approx["rank"] == 0)].iloc[0]
        assert top["vec_id"] == pdf["vec_id"][qi]  # self found despite probing


def test_binary_features_stage():
    from biosample_enricher_ray.stages.multimodal import BinaryFeatures

    payloads = [b"\x89PNG\r\n\x1a\nxx", b"\xff\xd8\xffyy", b"GIF87az",
                b"GIF89az", b"RIFFwave", b"%PDF-1.7", b"PK\x03\x04zz",
                b"plain", b"", None, b"\x00\x00\x00\x00"]
    for typ in (pa.binary(), pa.large_binary()):
        t = pa.table({"payload": pa.array(payloads, typ)})
        out = BinaryFeatures(chunk_rows=3)(t).to_pandas()
        assert out["sniffed_format"].tolist() == [
            "png", "jpeg", "gif", "gif", "riff", "pdf", "zip",
            "unknown", "unknown", None, "unknown"]
        assert out["n_bytes"].tolist()[:3] == [10, 5, 7]
        assert out["n_distinct_bytes"].iloc[10] == 1      # all zero bytes
        assert out["entropy"].iloc[10] == 0.0             # degenerate dist
        assert pd.isna(out["entropy"].iloc[8])            # empty payload
        assert pd.isna(out["n_bytes"].iloc[9])            # null payload
        # entropy of a uniform 4-symbol payload is exactly 2 bits
        u = BinaryFeatures()(pa.table({"payload": pa.array([b"abcd"], typ)}))
        assert u["entropy"].to_pylist() == [2.0]


def test_binary_features_sliced_input():
    from biosample_enricher_ray.stages.multimodal import BinaryFeatures

    arr = pa.array([b"aaaa", b"\x89PNG\r\n\x1a\nbb", b"abab", b"x"], pa.binary())
    whole = BinaryFeatures()(pa.table({"payload": arr})).to_pandas()
    part = BinaryFeatures()(pa.table({"payload": arr.slice(1, 2)})).to_pandas()
    assert part["sniffed_format"].tolist() == ["png", "unknown"]
    assert part["n_bytes"].tolist() == whole["n_bytes"].tolist()[1:3]
    assert part["entropy"].tolist() == whole["entropy"].tolist()[1:3]


# ---------------------------------------------------------- shared spans


def _span_corpus():
    """Fully distinct random-word texts (no organic shared 16-gram possible
    in practice), with 32-token spans planted between chosen pairs."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(41)
    vocab = [f"w{i:04d}" for i in range(5000)]

    def doc(n):
        return " ".join(rng.choice(vocab, size=n))

    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "text": doc(60)})
    # plant: doc 100+j = fresh 50-token doc with doc j's tokens 10..42
    # spliced in the middle (a verbatim 32-token run, not a prefix)
    for j in range(5):
        span = " ".join(rows[j]["text"].split()[10:42])
        rows.append({
            "doc_id": 100 + j,
            "text": doc(9) + " " + span + " " + doc(9),
        })
    return pd.DataFrame(rows)


def test_shared_span_pairs_planted_exact():
    from biosample_enricher_ray.stages.dedup import shared_span_pairs

    df = _span_corpus()
    expected = {(j, 100 + j) for j in range(5)}
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        pairs = shared_span_pairs(ds, span_tokens=32)
        got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
        # precision AND recall: exactly the planted pairs, nothing organic
        assert got == expected
        assert (pairs["n_shared"] >= 1).all()


def test_shared_span_pairs_short_docs_emit_nothing():
    import pandas as pd

    from biosample_enricher_ray.stages.dedup import shared_span_pairs

    # identical texts but < span_tokens tokens: no full span can exist
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["alpha beta gamma delta"] * 2,
    })
    pairs = shared_span_pairs(ray.data.from_pandas(df), span_tokens=32)
    assert len(pairs) == 0


def test_shared_span_pairs_star_cap():
    import pandas as pd

    from biosample_enricher_ray.stages.dedup import shared_span_pairs

    span = " ".join(f"s{i}" for i in range(40))
    df = pd.DataFrame({
        "doc_id": list(range(200)),
        "text": [span] * 200,  # one mega-group
    })
    pairs = shared_span_pairs(
        ray.data.from_pandas(df), span_tokens=32, max_group_size=16
    )
    # star edges: O(m) pairs, all anchored at min id, never O(m^2)
    assert 0 < len(pairs) < 200 * 199 // 2
    ids = set(pairs["id_a"]) | set(pairs["id_b"])
    assert ids == set(range(200))  # connectivity: every doc appears


def test_benchmark_span_overlap_broadcast():
    from biosample_enricher_ray.stages.dedup import benchmark_span_overlap

    df = _span_corpus()[:30]  # the 30 fully distinct docs, no planted rows
    # benchmark = doc 3's tokens 5..40 (a mid-document 35-token span)
    bench = [" ".join(df.loc[3, "text"].split()[5:40])]
    for blocks in (1, 5):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = benchmark_span_overlap(ds, bench, span_tokens=32)
        assert list(out["doc_id"]) == [3]  # precision AND recall
        assert int(out["n_overlap"].iloc[0]) >= 1
    # empty benchmark: nothing flagged
    out = benchmark_span_overlap(
        ray.data.from_pandas(df), [], span_tokens=32
    )
    assert len(out) == 0


def test_benchmark_span_overlap_bloom_path():
    """The Bloom broadcast path must flag every truly contaminated doc (no
    false negatives, structural) and agree with the exact-set path on this
    corpus; the dataset- and fragment-path inputs agree too."""
    from biosample_enricher_ray.stages.dedup import benchmark_span_overlap

    df = _span_corpus()[:30]
    bench = [" ".join(df.loc[3, "text"].split()[5:40]),
             " ".join(df.loc[7, "text"].split()[0:35])]
    ds = ray.data.from_pandas(df).repartition(3)
    exact = benchmark_span_overlap(ds, bench, span_tokens=32, method="set")
    bloom = benchmark_span_overlap(
        ray.data.from_pandas(df).repartition(3), bench, span_tokens=32,
        method="bloom",
    )
    # structural guarantee: bloom flags ⊇ exact flags (no false negatives);
    # false positives are allowed by contract but must stay rare on this
    # tiny fingerprint universe (a handful at 1% configured rate)
    assert set(exact["doc_id"]) <= set(bloom["doc_id"])
    assert sorted(exact["doc_id"]) == [3, 7]
    assert {3, 7} <= set(bloom["doc_id"])
    assert len(set(bloom["doc_id"]) - {3, 7}) <= 3

    import pytest as _pytest
    with _pytest.raises(ValueError):
        benchmark_span_overlap(ds, bench, span_tokens=32, method="nope")


def test_kmeans_distributed_matches_numpy_lloyd(sf001_dir):
    """The distributed Lloyd (per-batch partials + k-bounded groupby
    reduce) must equal an exact single-machine Lloyd with the same
    deterministic min-hash init, up to float summation order."""
    import pyarrow.parquet as pq

    from biosample_enricher_ray.stages.ann import (
        _normalize,
        _to_matrix,
        kmeans_distributed,
    )

    k, iters, seed = 8, 5, 13
    ds = ray.data.read_parquet(f"{sf001_dir}/embeddings.parquet")
    got = kmeans_distributed(ds, n_clusters=k, iters=iters, seed=seed,
                             concurrency=2)

    t = pq.read_table(f"{sf001_dir}/embeddings.parquet")
    ids = t["vec_id"].to_numpy().astype(np.uint64)
    mult, mod = np.uint64(2654435761 + 2 * seed), np.uint64(4294967296)
    h = (ids % mod) * mult % mod
    order = np.lexsort((ids, h))[:k]
    x = _normalize(_to_matrix(t["embedding"].combine_chunks()).astype(np.float64))
    c = _normalize(x[order])
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        new = c.copy()
        for j in range(k):
            m = assign == j
            if m.any():
                new[j] = x[m].mean(axis=0)
        c = _normalize(new)
    assert np.abs(got - c).max() < 1e-9


def test_semdedup_greedy_keeps_lowest_id():
    """Greedy ascending-id semantics: in a chain of three near-identical
    vectors the lowest id is kept and BOTH others are removed against it
    (not chained to each other)."""
    from biosample_enricher_ray.stages.ann import semdedup

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16).astype(np.float64)
    vecs = [base, base + 1e-4, base + 2e-4] + [
        rng.standard_normal(16) for _ in range(20)
    ]
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([np.asarray(v, np.float32).tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = semdedup(ds, threshold=0.95, n_clusters=4, kmeans_iters=3,
                   concurrency=2).to_pandas().sort_values("removed_id")
    assert list(out["removed_id"]) == [1, 2]
    assert list(out["kept_id"]) == [0, 0]


def test_semdedup_planted_k_independent(sf001_dir):
    """Byte-identical copies share a nearest centroid at ANY k, so the
    planted gate's removed set is invariant to the cluster count."""
    from biosample_enricher_ray.pipelines.queries import _planted_copy_path
    from biosample_enricher_ray.stages.ann import semdedup

    path = _planted_copy_path(sf001_dir, "embeddings", "vec_id")
    for k in (3, 11):
        out = semdedup(ray.data.read_parquet(path), threshold=0.95,
                       n_clusters=k, kmeans_iters=2, concurrency=2).to_pandas()
        assert sorted(out["removed_id"]) == [1000000 + i for i in range(50)]
        assert sorted(out["kept_id"]) == list(range(50))
