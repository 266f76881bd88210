"""Transcripts source: deterministic synthesis of the engine's input table
(conv_id, turn_idx, role, text, tool, ts) from the driver's ``documents``
Parquet, plus a plain Parquet reader for pre-existing transcript tables.

The synthesis is fully vectorized (pyarrow.compute / numpy, no per-row
Python in the expansion) and matches ``functions.kgspec.transcripts_sql``
row-for-row — pinned by ``tests/test_transcripts.py`` against DuckDB.

At 100 TB the real input would already BE a transcripts table; this module
then reduces to :func:`read_transcripts` (column-pruned ``read_parquet``).
The synthesizer exists so every scale factor of the sandbox test data
yields a transcripts corpus with known extraction ground truth.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ntto_ray.functions import kgspec as K

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_EPOCH_US = np.datetime64(K.EPOCH.replace(" ", "T"), "us")


def _concat(*parts) -> pa.Array:
    """Element-wise string concat (separator '')."""
    return pc.binary_join_element_wise(*parts, "")


def synth_transcript_batch(batch: pa.Table) -> pa.Table:
    """documents rows → TURNS_PER_CONV transcript rows each, vectorized.

    Layout: all turns for doc i are contiguous (repeat/tile), so turn text
    can be assembled with one utf8_slice per turn index and a final
    take-based interleave.
    """
    n = batch.num_rows
    tpc = K.TURNS_PER_CONV
    doc_id = batch["doc_id"].combine_chunks()
    text = batch["text"].combine_chunks()
    lang = batch["lang"].combine_chunks()
    source = batch["source"].combine_chunks()

    did = doc_id.to_numpy()

    # conv_id = 'conv-%08d' % doc_id
    conv_ids = _concat(
        pa.array(["conv-"] * n),
        pc.utf8_lpad(pc.cast(doc_id, pa.string()), width=8, padding="0"),
    )

    topic = pc.cast(pa.array(did % K.TOPIC_MOD), pa.string())
    gnd = pc.cast(pa.array(did % K.GND_MOD), pa.string())
    status = pc.cast(pa.array(did % K.STATUS_MOD), pa.string())

    texts_per_k: list[pa.Array] = []
    for k in range(tpc):
        chunk = pc.utf8_slice_codeunits(text, start=k * K.CHUNK, stop=(k + 1) * K.CHUNK)
        r = k % 3
        if r == 0:
            t = _concat(
                chunk,
                pa.scalar(" please look into <http://dbpedia.org/resource/Topic_"),
                topic,
                pa.scalar("> and "),
                lang,
            )
        elif r == 1:
            t = _concat(
                chunk,
                pa.scalar(" found <http://dbpedia.org/resource/Topic_"),
                topic,
                pa.scalar("> see also <http://d-nb.info/gnd/"),
                gnd,
                pa.scalar(f"-{k}>"),
            )
        else:
            t = _concat(
                pa.scalar("result "),
                chunk,
                pa.scalar(f" from <{K.SOURCE_NS}"),
                source,
                pa.scalar("> status "),
                status,
            )
        texts_per_k.append(t)

    # Interleave: output row j = doc j//tpc, turn j%tpc.
    doc_index = np.repeat(np.arange(n, dtype=np.int64), tpc)
    k_arr = np.tile(np.arange(tpc, dtype=np.int32), n)

    # turn text: take row doc_index[j] from texts_per_k[k
    # ]; build via concat of per-k arrays then a single take.
    stacked = pa.concat_arrays([t.cast(pa.string()) for t in texts_per_k])
    # row for (doc i, turn k) lives at offset k*n + i in `stacked`
    take_idx = k_arr.astype(np.int64) * n + doc_index
    out_text = stacked.take(pa.array(take_idx))

    out_conv = conv_ids.take(pa.array(doc_index))
    roles = np.array(K.ROLES, dtype=object)[k_arr % 3]
    tools = np.where(k_arr % 3 == 2, "search", "")
    ts = _EPOCH_US + (np.repeat(did, tpc) * 60 + k_arr * 5).astype("timedelta64[s]")

    return pa.Table.from_arrays(
        [
            out_conv,
            pa.array(k_arr, type=pa.int32()),
            pa.array(roles, type=pa.string()),
            out_text,
            pa.array(tools, type=pa.string()),
            pa.array(ts.astype("datetime64[us]"), type=pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


_REPLICATE_STRIDE = 10_000_000


def _replicate_docs(batch: pa.Table, *, copies: int) -> pa.Table:
    """Deterministic corpus amplification for benchmarks: each document
    appears ``copies`` times with doc_id offset by r*STRIDE, producing
    distinct conversations with identical text distribution. Vectorized
    (concat of shifted id columns)."""
    # parquet-read batches carry pandas schema metadata (a dict) that Ray's
    # shuffle cannot hash for schema dedup — strip it before fan-out
    batch = batch.replace_schema_metadata(None)
    if copies <= 1:
        return batch
    parts = []
    ids = batch["doc_id"]
    for r in range(copies):
        parts.append(
            batch.set_column(
                batch.column_names.index("doc_id"),
                "doc_id",
                pc.add(ids, pa.scalar(r * _REPLICATE_STRIDE, pa.int64())),
            )
        )
    return pa.concat_tables(parts)


def synth_transcripts(
    sf_dir: str, *, replicate: int = 1, concurrency: int | None = None
) -> ray.data.Dataset:
    """Read ``{sf_dir}/documents.parquet`` (pruned to the 4 needed columns)
    and expand to the deterministic transcripts table. ``replicate`` > 1
    amplifies the corpus for benchmarking (distinct conv_ids, same
    distribution); correctness queries always use replicate=1."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    # strip pandas schema metadata (a dict) before the repartition below:
    # Ray's shuffle can't hash metadata-bearing schemas for dedup and logs
    # a warning per block
    docs = docs.map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # The documents table arrives as very few blocks (one small file), but
    # each doc fans out ×TURNS_PER_CONV×replicate downstream — split the
    # small side BEFORE the expansion so every core gets work. (A real
    # 100 TB transcripts input is already many files/row-groups and skips
    # this: read_transcripts below.)
    import os

    import ray as _ray

    cpus = int(_ray.available_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    # Block count: ≈60k turns (~50 MB of downstream triples) per block,
    # floored at 2×CPUs so a small input still fans out. Measured sweet
    # spot for the full streaming topology: smaller blocks (8×CPUs) win
    # for an isolated map stage (more waves per actor hide ramp-up and
    # stragglers) but lose end-to-end, where stage overlap already hides
    # tails and per-block costs in the sort dominate. At 100 TB the data
    # term dominates and gives thousands of blocks regardless.
    n_docs = docs.count()
    turns = n_docs * replicate * K.TURNS_PER_CONV
    blocks = int(os.environ.get(
        "NTTO_SOURCE_BLOCKS", max(cpus * 2, min(512, turns // 60_000), 16)
    ))
    docs = docs.repartition(blocks)
    if replicate > 1:
        docs = docs.map_batches(
            _replicate_docs, batch_format="pyarrow", fn_kwargs={"copies": replicate}
        )
    return docs.map_batches(
        synth_transcript_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def read_transcripts(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """The production-path source: column-pruned Parquet read of an
    existing transcripts table (many files → file/row-group parallelism)."""
    return ray.data.read_parquet(path, columns=columns)
