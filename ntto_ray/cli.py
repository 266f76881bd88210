"""ntto-compatible CLI over the Ray Data engine.

Mirrors the reference's flag surface (cmd/ntto/ntto.go:66-78):

  -a            abbreviate n-triples using rules
  -j            convert nt to json (NDJSON lines on stdout or -o)
  -c            dump constructed sed command and exit (parity surface)
  -d            dump rules and exit
  -i            ignore conversion errors (drop-row policy + counter)
  -n NULL       null-replacement sentinel (default "<NULL>")
  -o FILE       output file/dir
  -r FILE       rules file (built-in table if absent)
  -v            print version
  -w N          parallelism (Ray concurrency; reference: worker count)
  --sed-parity  use the reference's ordered-global-replace semantics
                instead of anchored longest-prefix match

plus the engine's own entry points:

  kg --sf-dir DIR --out DIR [--partitions P] [--resume]   full KG pipeline

Unlike the reference, ``-a -j`` is one fused streaming topology (no
tempfile barrier, ntto.go:158-159), and ``-j`` output order is
deterministic (the reference's channel fan-in is not, ntto.go:174-199).
"""

from __future__ import annotations

import argparse
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def main(argv: list[str] | None = None) -> int:
    from ntto_ray import core

    ap = argparse.ArgumentParser(prog="ntto-ray", add_help=True)
    ap.add_argument("-a", action="store_true", help="abbreviate n-triples using rules")
    ap.add_argument("-j", action="store_true", help="convert nt to ndjson")
    ap.add_argument("-c", action="store_true", help="dump constructed sed command and exit")
    ap.add_argument("-d", action="store_true", help="dump rules and exit")
    ap.add_argument("-i", action="store_true", help="ignore conversion errors")
    ap.add_argument("-n", default=core.NULL_SENTINEL, metavar="NULL")
    ap.add_argument("-o", default="", metavar="FILE")
    ap.add_argument("-r", default="", metavar="RULESFILE")
    ap.add_argument("-v", action="store_true", help="print version and exit")
    ap.add_argument("-w", type=int, default=None, metavar="N")
    ap.add_argument(
        "-cpuprofile",
        default="",
        metavar="FILE",
        help="write a driver CPU profile to FILE (reference parity, "
        "ntto.go:87-94; Go writes pprof, this writes cProfile pstats)",
    )
    ap.add_argument("--sed-parity", action="store_true")
    ap.add_argument("--kg-sf-dir", default="", help="run the KG pipeline over this sf dir")
    ap.add_argument("--kg-out", default="/tmp/ntto_ray_kg")
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("file", nargs="?", default="")
    args = ap.parse_args(argv)

    if args.cpuprofile:
        # reference parity (ntto.go:87-94): profile the whole command.
        # Driver-side only — distributed task profiles live in Ray's
        # timeline/stats, not a single-process pprof.
        import cProfile

        prof = cProfile.Profile()
        args.cpuprofile, out = "", args.cpuprofile
        prof.enable()
        try:
            return _dispatch(args, ap)
        finally:
            prof.disable()
            prof.dump_stats(out)
    return _dispatch(args, ap)


def _dispatch(args, ap) -> int:
    from ntto_ray import core

    if args.v:
        print(core.APP_VERSION)
        return 0

    if args.r:
        with open(args.r) as f:
            rules = core.parse_rules(f.read())
    else:
        rules = core.default_rules()

    if args.d:
        print(core.dump_rules(rules))
        return 0

    if args.c:
        # parity surface: print the perl command the reference would run
        import os

        w = args.w or (os.cpu_count() or 4)
        cmd = core.sedify_null(rules, w, args.file, args.n)
        out = args.o or "/tmp/ntto-out"
        print(f"{cmd} > {out}")
        return 0

    if args.kg_sf_dir:
        _ensure_ray(args.w)
        from ntto_ray.pipelines.kg import run_kg_pipeline

        if args.partitions > 1:
            from ntto_ray.pipelines.kg import build_graph
            from ntto_ray.sources.transcripts import synth_transcripts
            from ntto_ray.state.checkpoint import (
                content_fingerprint,
                conv_partition_filter,
                run_partitioned,
            )

            def make(pid: int, n: int):
                t = synth_transcripts(args.kg_sf_dir).map_batches(
                    conv_partition_filter(pid, n), batch_format="pyarrow"
                )
                return build_graph(t)

            res = run_partitioned(
                num_partitions=args.partitions,
                out_dir=args.kg_out,
                make_partition_ds=make,
                fingerprint=content_fingerprint(args.kg_sf_dir),
            )
            done = sum(1 for r in res if not r.skipped)
            print(f"partitions={len(res)} ran={done} rows={sum(r.rows for r in res)}")
        else:
            run_kg_pipeline(args.kg_sf_dir, args.kg_out, write=True)
            print(f"wrote {args.kg_out}")
        return 0

    if not args.file:
        ap.print_usage(sys.stderr)
        return 1

    if args.a and not args.j:
        # Reference parity: the -a-only path never parses — ordered
        # global replaces over the RAW lines (common.go:104-127), so
        # literals / terminal dots / spacing are preserved byte-for-byte.
        _ensure_ray(args.w)
        import ray.data

        from ntto_ray.stages.materialize import NDJSONLinesSink
        from ntto_ray.stages.prefix import RawLineAbbrev

        raw = ray.data.read_text(args.file).map_batches(
            RawLineAbbrev,
            batch_format="pyarrow",
            concurrency=(1, args.w or 8),
            fn_constructor_kwargs={
                "rules": [(r.shortcut, r.prefix) for r in rules],
                "null": args.n,
            },
        )
        out = args.o or "/tmp/ntto-ray-abbrev"
        raw.write_datasink(NDJSONLinesSink(out))
        print(f"wrote {out}", file=sys.stderr)
        return 0

    if args.a or args.j:
        _ensure_ray(args.w)
        import ray.data

        from ntto_ray.stages.materialize import NDJSONLinesSink, render_ndjson_batch
        from ntto_ray.stages.ntparse import parse_nt_batch
        from ntto_ray.stages.prefix import PrefixCut

        ds = ray.data.read_text(args.file)
        ds = ds.map_batches(
            parse_nt_batch,
            batch_format="pyarrow",
            fn_kwargs={"on_error": "drop" if args.i else "raise"},
        )
        if args.a:
            ds = ds.map_batches(
                PrefixCut,
                batch_format="pyarrow",
                concurrency=(1, args.w or 8),
                fn_constructor_kwargs={
                    "rules": [(r.shortcut, r.prefix) for r in rules],
                    "mode": "sed-parity" if args.sed_parity else "anchored",
                    "null": args.n,
                },
            )
        lines = ds.map_batches(render_ndjson_batch, batch_format="pyarrow")
        if args.o:
            lines.write_datasink(NDJSONLinesSink(args.o))
        else:
            for batch in lines.iter_batches(batch_format="pyarrow"):
                for line in batch["line"].to_pylist():
                    sys.stdout.write(line + "\n")
        return 0

    ap.print_usage(sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
