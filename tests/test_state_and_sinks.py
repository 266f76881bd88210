"""Checkpoint/resume, materialize sinks, multimodal plumbing, ANN."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import SF_SMALL


def test_checkpoint_resume(ray_session, tmp_path):
    import ray.data

    from ntto_ray.state.checkpoint import run_partitioned

    calls = []

    def make(pid: int, n: int):
        calls.append(pid)
        return ray.data.range(100).map_batches(
            lambda b: {"id": b["id"], "part": np.full(len(b["id"]), pid)},
            batch_format="numpy",
        )

    out = str(tmp_path / "ckpt")
    r1 = run_partitioned(
        num_partitions=3, out_dir=out, make_partition_ds=make, fingerprint="fp1"
    )
    assert [r.skipped for r in r1] == [False] * 3
    assert all(r.rows == 100 for r in r1)
    assert calls == [0, 1, 2]

    # resume: nothing re-runs
    r2 = run_partitioned(
        num_partitions=3, out_dir=out, make_partition_ds=make, fingerprint="fp1"
    )
    assert [r.skipped for r in r2] == [True] * 3
    assert calls == [0, 1, 2]

    # changed input fingerprint: everything re-runs
    r3 = run_partitioned(
        num_partitions=3, out_dir=out, make_partition_ds=make, fingerprint="fp2"
    )
    assert [r.skipped for r in r3] == [False] * 3

    # manifest is lineage: one line per committed partition
    with open(os.path.join(out, "MANIFEST.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert len(recs) == 6
    assert {r["fingerprint"] for r in recs} == {"fp1", "fp2"}


def test_write_ndjson_and_adjacency(ray_session, tmp_path):
    import ray.data

    from ntto_ray.stages.materialize import write_adjacency, write_ndjson

    triples = ray.data.from_items(
        [
            {"subj": "a", "pred": "p", "obj": "x<y", "cnt": 2},
            {"subj": "b", "pred": "p", "obj": "o2", "cnt": 1},
        ]
    )
    nd_dir = str(tmp_path / "nd")
    write_ndjson(triples.select_columns(["subj", "pred", "obj"]), nd_dir)
    lines = []
    for fn in os.listdir(nd_dir):
        with open(os.path.join(nd_dir, fn)) as f:
            lines += [line for line in f.read().splitlines() if line]
    assert sorted(lines) == [
        '{"s":"a","p":"p","o":"x\\u003cy"}',
        '{"s":"b","p":"p","o":"o2"}',
    ]
    # Go-escaped NDJSON still parses as standard JSON
    parsed = sorted(json.loads(line)["s"] for line in lines)
    assert parsed == ["a", "b"]

    adj_dir = str(tmp_path / "adj")
    write_adjacency(triples, adj_dir, buckets=4)
    import pyarrow.dataset as pads

    dset = pads.dataset(adj_dir, partitioning="hive")
    t = dset.to_table()
    assert t.num_rows == 2
    assert "subj_bucket" in t.column_names


def test_multimodal_plumbing(ray_session):
    from ntto_ray.stages.multimodal import (
        DecodeImage,
        decode_features,
        sample_frames,
        synth_media,
    )

    media = synth_media(SF_SMALL)
    feats = decode_features(media, fake=True).to_pandas()
    assert set(feats.columns) == {"media_id", "width", "height", "feature"}
    assert len(feats) > 0
    assert all(len(f) == 8 for f in feats["feature"])

    frames = sample_frames(media).to_pandas()
    assert set(frames.columns) == {"media_id", "frame_ts_ms", "frame_hash"}
    assert len(frames) > 0

    # compressed/unknown formats still raise — only PPM/BMP decode
    # without an image library
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)(
            pa.table(
                {
                    "media_id": [1],
                    "payload": [b"\x89PNG..."],
                    "width": [1],
                    "height": [1],
                }
            )
        )


def test_curate_kill_and_resume(ray_session, tmp_path):
    """Composed curation pipeline killed mid-run resumes from the last
    committed checkpoint and produces EXACTLY the single-shot result:
    kill #1 right after the dedup stage commits, kill #2 after the first
    fill partition commits; the resumed run skips both committed units
    and the final table equals corpus_curate_pipeline's output."""
    import pandas as pd

    from ntto_ray.pipelines.curate import (
        SimulatedFailure,
        curate_checkpointed,
        read_curated,
    )
    from ntto_ray.queries_text_ext import corpus_curate_pipeline

    out = str(tmp_path / "curate")

    # kill #1: after stage A (dedup) commits
    with pytest.raises(SimulatedFailure):
        curate_checkpointed(SF_SMALL, out, num_partitions=3, fail_after_dedup=True)

    # kill #2: stage A skipped on resume; fill partition 0 commits, then die
    with pytest.raises(SimulatedFailure):
        curate_checkpointed(
            SF_SMALL, out, num_partitions=3, fail_before_partition=1
        )

    # resume to completion: everything committed is skipped
    res = curate_checkpointed(SF_SMALL, out, num_partitions=3)
    assert res["stage_a_skipped"] is True
    assert [p.skipped for p in res["partitions"]] == [True, False, False]

    got = (
        read_curated(out)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    want = (
        corpus_curate_pipeline(SF_SMALL)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)

    # idempotent rerun: all units skip, nothing recomputes
    res2 = curate_checkpointed(SF_SMALL, out, num_partitions=3)
    assert res2["stage_a_skipped"] is True
    assert all(p.skipped for p in res2["partitions"])


def test_image_codec_roundtrip():
    """Pure-numpy PPM/BMP codecs: encode → decode is the identity, incl.
    BMP row padding (width not a multiple of 4) and PPM comments."""
    import numpy as np

    from ntto_ray.stages.multimodal import (
        decode_image_array,
        encode_bmp,
        encode_ppm,
    )

    from ntto_ray.stages.multimodal import encode_png

    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (3, 5), (4, 8), (7, 3)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_image_array(encode_ppm(arr)) == arr).all()
        assert (decode_image_array(encode_bmp(arr)) == arr).all()
        # PNG: every scanline filter type decodes to the same pixels
        for ft in range(5):
            assert (
                decode_image_array(encode_png(arr, filter_type=ft)) == arr
            ).all()

    # GIF: indexed LZW roundtrip through dictionary growth, the KwKwK
    # case (constant image) and the 12-bit clear-and-reset path
    from ntto_ray.stages.multimodal import encode_gif

    for h, w, ncol in [(4, 8, 8), (7, 3, 16), (16, 16, 64), (100, 100, 256)]:
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
        assert (decode_image_array(encode_gif(idx, pal)) == pal[idx]).all()
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = np.zeros((50, 50), np.uint8)
    assert (decode_image_array(encode_gif(idx, pal)) == pal[idx]).all()

    # PPM with a header comment
    arr = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    ppm = b"P6\n# a comment\n2 2\n255\n" + arr.tobytes()
    assert (decode_image_array(ppm) == arr).all()


def test_decode_image_real_features(ray_session):
    """DecodeImage real path over real PPM payloads: features match a
    direct numpy computation of the pixel statistics."""
    import numpy as np

    from ntto_ray.stages.multimodal import (
        DecodeImage,
        decode_features,
        synth_media,
    )

    media = synth_media(SF_SMALL, real_images=True)
    feats = decode_features(media, fake=False).to_pandas()
    assert len(feats) > 0
    assert all(len(f) == 8 for f in feats["feature"])
    assert set(feats["width"]) == {8}
    assert set(feats["height"]) <= {4, 5, 6, 7}

    # cross-check one image end to end
    import hashlib

    row = feats.iloc[0]
    mid = int(row["media_id"])
    digest = hashlib.sha256(str(mid).encode()).digest()
    n = 8 * (4 + mid % 4) * 3
    b = np.frombuffer((digest * (n // 32 + 1))[:n], np.uint8).astype(np.float64)
    expect = np.array(
        [
            b[0::3].sum() / (n / 3),
            b[1::3].sum() / (n / 3),
            b[2::3].sum() / (n / 3),
            b.sum() / n,
            b.min(),
            b.max(),
            (b * b).sum() / n - (b.sum() / n) ** 2,
            (b > 127).sum() / n,
        ]
    ).astype(np.float32)
    assert np.array_equal(np.asarray(row["feature"], dtype=np.float32), expect)


def test_ann_lsh_subset_of_bruteforce(ray_session):
    import pyarrow.parquet as pq

    import ray.data

    from ntto_ray.stages.ann import brute_force_topk, lsh_topk

    emb = ray.data.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()[:2]
    m = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()[:2]]).astype(
        np.float64
    )

    bf = brute_force_topk(emb, ids, m, k=10).to_pandas()
    assert set(bf.columns) == {"qid", "vec_id", "rank"}
    assert (bf.groupby("qid")["rank"].max() == 10).all()

    lsh = lsh_topk(emb, ids, m, k=10, dim=m.shape[1], nbits=4).to_pandas()
    assert len(lsh) > 0
    # LSH results rank by true cosine, so rank-1 per query must agree with
    # brute force IF the true top-1 shares the query's bucket; weaker
    # invariant that always holds: every LSH neighbor appears somewhere in
    # the corpus and ranks are contiguous from 1
    for qid, g in lsh.groupby("qid"):
        assert list(g.sort_values("rank")["rank"]) == list(range(1, len(g) + 1))


def test_knn_join_matches_local_exact(ray_session):
    """Tiled kNN self-join == single-process exact top-k (sim DESC,
    vec_id ASC) — pins the pair replication + two-exchange reduce, with
    tile=64 forcing MULTIPLE tiles so cross-tile pairs are exercised."""
    import pyarrow.parquet as pq

    import ray.data

    from ntto_ray.stages.ann import knn_join

    emb = ray.data.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    got = (
        knn_join(emb, k=3, tile=64)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )

    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    vid = t["vec_id"].to_numpy()
    order = np.argsort(vid)
    vid = vid[order]
    m = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()]).astype(
        np.float64
    )[order]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    want = []
    for i in range(len(vid)):
        idx = np.lexsort((vid, -sims[i]))[:3]
        want += [(int(vid[i]), int(vid[j]), r + 1) for r, j in enumerate(idx)]
    import pandas as pd

    want = pd.DataFrame(want, columns=["qid", "vec_id", "rank"])
    assert got.equals(want)


def test_semantic_dedup_matches_local_reference(ray_session):
    """Distributed SemDeDup == a single-process numpy reference (same
    mirrored k-means, same greedy lower-id-wins rule) — pins the
    cluster-keyed exchange + per-cluster verify independent of SQL."""
    import pyarrow.parquet as pq

    import ray.data

    from ntto_ray.stages.ann import _kmeans, semantic_dedup

    emb = ray.data.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    got = (
        semantic_dedup(emb, nlist=8, threshold=0.3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    vid = t["vec_id"].to_numpy()
    order = np.argsort(vid)
    vid = vid[order]
    m = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()]).astype(
        np.float64
    )[order]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cent = _kmeans(m[vid < 4096], 8)
    assign = np.argmax(m @ cent.T, axis=1)
    sims = m @ m.T
    keep = np.ones(len(vid), dtype=bool)
    for c in np.unique(assign):
        idx = np.flatnonzero(assign == c)  # vid-ascending already
        s = sims[np.ix_(idx, idx)]
        keep[idx[np.triu(s >= 0.3, k=1).any(axis=0)]] = False

    assert list(got["vec_id"]) == list(vid[keep])
    assert list(got["cluster"]) == list(assign[keep])
    assert 0 < len(got) < len(vid)  # drops something, keeps something


def test_ann_ivf_recall_vs_bruteforce(ray_session):
    import pyarrow.parquet as pq

    import ray.data

    from ntto_ray.stages.ann import brute_force_topk, ivf_topk

    emb = ray.data.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()[:3]
    m = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()[:3]]).astype(
        np.float64
    )

    bf = brute_force_topk(emb, ids, m, k=10).to_pandas()
    ivf = ivf_topk(emb, ids, m, k=10, nlist=8, nprobe=4).to_pandas()
    assert set(ivf.columns) == {"qid", "vec_id", "rank"}
    # ranks contiguous from 1 per query
    for qid, g in ivf.groupby("qid"):
        assert list(g.sort_values("rank")["rank"]) == list(range(1, len(g) + 1))
    # probing half the lists must recover a solid fraction of true top-10
    hits = tot = 0
    for qid in ids:
        truth = set(bf.loc[bf.qid == qid, "vec_id"])
        got = set(ivf.loc[ivf.qid == qid, "vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    assert hits / tot >= 0.5, f"IVF recall {hits}/{tot} too low"


def test_media_frame_sampler_hash_deterministic(ray_session):
    from ntto_ray.stages.multimodal import sample_frames, synth_media

    a = sample_frames(synth_media(SF_SMALL), fps=1.0).to_pandas()
    b = sample_frames(synth_media(SF_SMALL), fps=1.0).to_pandas()
    key = ["media_id", "frame_ts_ms"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert (a["frame_hash"] >= 0).all()


def test_ndjson_output_byte_stable(ray_session, tmp_path):
    """Two consecutive end-to-end runs produce byte-identical NDJSON —
    preserve_order + per-block (subj, pred, obj) sort (the reference's
    worker fan-in is explicitly nondeterministic, ntto.go:174-199; this
    engine pins the order). No sorting in this test: raw file bytes."""
    import hashlib
    import os

    from ntto_ray.pipelines.kg import run_kg_pipeline
    from ntto_ray.stages.materialize import write_ndjson
    from tests.conftest import SF_SMALL

    digests = []
    for run in ("a", "b"):
        out = tmp_path / f"nd_{run}"
        canonical = run_kg_pipeline(SF_SMALL).select_columns(["subj", "pred", "obj"])
        write_ndjson(canonical, str(out))
        files = sorted(os.listdir(out))
        h = hashlib.blake2b(digest_size=16)
        for f in files:
            h.update(f.encode())
            h.update((out / f).read_bytes())
        digests.append((tuple(files), h.hexdigest()))
    assert digests[0] == digests[1]


def test_ndjson_source_roundtrip(ray_session, tmp_path):
    """write_ndjson → read_ndjson_triples is the identity on triples,
    including Go-escaped characters (<, >, &, quotes, backslashes)."""
    import ray.data

    from ntto_ray.sources.ndjson import read_ndjson_triples
    from ntto_ray.stages.materialize import write_ndjson

    rows = [
        {"subj": "a", "pred": "p", "obj": "x<y"},
        {"subj": "b", "pred": "p", "obj": 'quote"back\\slash'},
        {"subj": "amp&s", "pred": "p>", "obj": "plain"},
        {"subj": "c", "pred": "q", "obj": "o2"},
    ]
    nd_dir = str(tmp_path / "nd_rt")
    write_ndjson(ray.data.from_items(rows), nd_dir)
    back = read_ndjson_triples(nd_dir).to_pandas()
    got = sorted(map(tuple, back[["subj", "pred", "obj"]].to_numpy()))
    want = sorted((r["subj"], r["pred"], r["obj"]) for r in rows)
    assert got == want


def test_ann_pq_recall_vs_bruteforce(ray_session):
    import pyarrow.parquet as pq

    import ray.data

    from ntto_ray.stages.ann import brute_force_topk, pq_topk

    emb = ray.data.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()[:3]
    m = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()[:3]]).astype(
        np.float64
    )

    bf = brute_force_topk(emb, ids, m, k=10).to_pandas()
    pqr = pq_topk(emb, ids, m, k=10).to_pandas()
    assert set(pqr.columns) == {"qid", "vec_id", "rank"}
    for qid, g in pqr.groupby("qid"):
        assert list(g.sort_values("rank")["rank"]) == list(range(1, len(g) + 1))
    # 4-byte codes (vs 512-byte raw) must still recover a solid fraction
    hits = tot = 0
    for qid in ids:
        truth = set(bf.loc[bf.qid == qid, "vec_id"])
        got = set(pqr.loc[pqr.qid == qid, "vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    assert hits / tot >= 0.3, f"PQ recall {hits}/{tot} too low"


def test_scene_cuts_matches_scalar_bruteforce():
    """SceneCuts vectorized kernel vs a per-frame scalar reference."""
    import hashlib

    import pyarrow as pa

    from ntto_ray.stages.multimodal import SceneCuts
    from ntto_ray.stages.sketch import _U, splitmix64

    payloads = [b"abc" * 11, b"xyz" * 7, b"q" * 5]
    durs = [9000, 1000, 5000]  # 9 frames, 1 frame (no cuts), 5 frames
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "kind": pa.array(["video", "video", "video"]),
            "payload": pa.array(payloads, pa.binary()),
            "duration_ms": pa.array(durs, pa.int32()),
        }
    )
    got = SceneCuts(fps=1.0, threshold=100)(t).to_pandas()

    want = []
    for mid, p, d in zip([1, 2, 3], payloads, durs):
        ph = int.from_bytes(hashlib.sha256(p.hex().encode()).digest()[:8], "little")
        n = max(1, d // 1000)
        sigs = [
            int(splitmix64(np.array([(ph + f) % 2**64], dtype=np.uint64))[0]) & 0xFF
            for f in range(n)
        ]
        for f in range(1, n):
            delta = abs(sigs[f] - sigs[f - 1])
            if delta >= 100:
                want.append((mid, f * 1000, delta))
    got_rows = list(
        zip(got["media_id"].astype(int), got["frame_ts_ms"].astype(int),
            got["sig_delta"].astype(int))
    )
    assert got_rows == want and len(want) > 0


def test_ivf_pq_recall_vs_bruteforce(ray_session):
    """Composed IVF+PQ: valid contiguous ranks per query, and recall@10
    vs exact brute force stays above a sanity floor on the small-sf
    corpus (PQ quantization + nprobe cell pruning lose some neighbors
    by design — the floor pins 'approximate', not 'broken')."""
    import pyarrow.parquet as pq

    import ray.data

    from ntto_ray.stages.ann import brute_force_topk, ivf_pq_topk

    emb = ray.data.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()[:3]
    m = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()[:3]]).astype(
        np.float64
    )

    bf = brute_force_topk(emb, ids, m, k=10).to_pandas()
    ipq = ivf_pq_topk(emb, ids, m, k=10).to_pandas()
    assert set(ipq.columns) == {"qid", "vec_id", "rank"}
    recalls = []
    for qid, g in ipq.groupby("qid"):
        assert list(g.sort_values("rank")["rank"]) == list(range(1, len(g) + 1))
        got = set(g["vec_id"])
        want = set(bf.loc[bf["qid"] == qid, "vec_id"])
        recalls.append(len(got & want) / max(1, len(want)))
    assert sum(recalls) / len(recalls) >= 0.3
