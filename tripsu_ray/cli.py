"""Command-line entry points (the distributed re-shape of tripsu's CLI).

Reference commands (src/main.rs:84-103): ``tripsu index`` (pass 1) and
``tripsu pseudo`` (pass 2) over N-Triples streams. Here:

- ``index``   : N-Triples/Parquet triples → type-index Parquet
- ``pseudo``  : triples + index + rules YAML + secret → pseudonymized
                triples (N-Triples or Parquet out)
- ``run``     : the full KG pipeline (synth/extract → index → pseudo →
                link → materialize), resumable via --checkpoint-dir —
                the ``ray job submit`` entry point
- ``bench``   : delegate to bench.py

stdin/stdout have no distributed analogue (a Dataset is read by many
tasks), so the distributed paths use files; directories of shards replace
single files. The reference's piped workflow (``-`` operands,
src/main.rs:34-63, docs/tutorial.md:10-16) IS supported for ``convert``
and ``pseudo`` via a single-process chunked path that never boots Ray —
byte-identical to the file-path run (pytest-pinned).

This module OWNS its Ray session (guarded init + shutdown); library code
never initializes Ray.
"""

from __future__ import annotations

import argparse
import json
import sys

from .sources import read_parquet_clean as _read_parquet_clean


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        import os

        # Under `ray job submit` the job runner exports RAY_ADDRESS for the
        # target cluster — defer to it (a hardcoded "local" would boot a
        # private single-node Ray inside the job). Standalone runs get a
        # local session with the requested CPU count.
        kwargs = {"include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        env_addr = os.environ.get("RAY_ADDRESS", "")
        if env_addr in ("", "local"):
            kwargs["address"] = "local"
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _read_triples(path: str, on_error: str, counter=None):
    import ray.data

    # format detection sees through a trailing .gz (readers route compressed
    # shards internally: one streaming decode task per .gz file)
    base = path[: -len(".gz")] if path.endswith(".gz") else path
    if base.endswith(".nt") or base.endswith(".ntriples"):
        from .sources.ntriples import read_ntriples

        return read_ntriples(path, on_error=on_error, counter=counter)
    if base.endswith(".jsonl") or base.endswith(".ndjson"):
        from .sources.flatfiles import read_jsonl

        return read_jsonl(path)
    if base.endswith(".tsv"):
        from .sources.flatfiles import read_tsv

        return read_tsv(path)
    if base.endswith(".nq") or base.endswith(".nquads"):
        from .sources.flatfiles import read_nquads

        return read_nquads(path, on_error=on_error, counter=counter)
    return _read_parquet_clean(path)


def _skip_counter(on_error: str):
    """JobCounters handle when the skip policy needs malformed-line counts."""
    if on_error != "skip":
        return None, None
    from .state.metrics import JobCounters

    jc = JobCounters()
    jc.reset()
    return jc, jc.handle()


def _write_triples(ds, path: str) -> list[str]:
    """Write to the sink chosen by extension; returns the columns that had
    to be dropped (quads → a sink with no graph slot: .nt / .tsv only —
    parquet and jsonl carry the 4th term through)."""
    base = path[: -len(".gz")] if path.endswith(".gz") else path
    is_nq = base.endswith(".nq") or base.endswith(".nquads")
    if path.endswith(".gz") and not (base.endswith(".nt") or base.endswith(".ntriples")):
        raise SystemExit(
            f"compressed output is supported for .nt.gz only (got {path!r})"
        )
    keeps_graph = is_nq or not (
        base.endswith(".nt") or base.endswith(".ntriples") or base.endswith(".tsv")
    )
    dropped: list[str] = []
    if not keeps_graph and "graph" in (ds.schema().names or []):
        # quads → triples-only sink: the graph term has no slot; drop it
        ds = ds.drop_columns(["graph"])
        dropped.append("graph")
        print("warning: quads narrowed to triples — graph column dropped "
              f"(sink {path!r} has no graph slot)", file=sys.stderr)
    if is_nq:
        from .sources.flatfiles import write_nquads

        write_nquads(ds, path)
    elif base.endswith(".nt") or base.endswith(".ntriples"):
        from .sources.ntriples import write_ntriples

        write_ntriples(
            ds, path, compression="gzip" if path.endswith(".gz") else None
        )
    elif base.endswith(".jsonl") or base.endswith(".ndjson"):
        from .sources.flatfiles import write_jsonl

        write_jsonl(ds, path)
    elif base.endswith(".tsv"):
        from .sources.flatfiles import write_tsv

        write_tsv(ds, path)
    else:
        ds.write_parquet(path)
    return dropped


# --- single-process pipe mode (`-` operands) -------------------------------
# The reference defaults input/output to stdin/stdout (src/main.rs:34-40,
# 50-63; docs/tutorial.md:10-16 pipes `cat graph.nt | tripsu pseudo ...`).
# A Dataset is read by many tasks, so the distributed engine uses paths —
# but the piped small-file workflow is real CLI conformance, served by a
# single-process chunked path that never boots Ray.

_PIPE_CHUNK = 65536


def _pipe_is_nt(path: str) -> bool:
    return path == "-" or path.endswith(".nt") or path.endswith(".ntriples")


def _substantive(lines: list[str]) -> int:
    """Lines the parser actually attempts (blank/comment lines are LEGAL
    N-Triples and dropped silently) — so pipe-mode "skipped" counts only
    MALFORMED lines, same semantics as the distributed JobCounters."""
    return sum(
        1 for l in lines if l.strip() and not l.strip().startswith("#")
    )


def _pipe_in(path: str):
    """Yield line-list chunks from stdin or an .nt file (bounded memory)."""
    f = sys.stdin if path == "-" else open(path, "r", encoding="utf-8")
    try:
        while True:
            lines = []
            for line in f:
                lines.append(line.rstrip("\n"))
                if len(lines) >= _PIPE_CHUNK:
                    break
            if not lines:
                break
            yield lines
            if len(lines) < _PIPE_CHUNK:
                break
    finally:
        if path != "-":
            f.close()


def _pipe_out(path: str):
    return sys.stdout if path == "-" else open(path, "w", encoding="utf-8")


def _pipe_convert(args):
    import pyarrow as pa

    from .functions.rdf import parse_ntriples_lines, serialize_ntriples

    if not (_pipe_is_nt(args.input) and _pipe_is_nt(args.output)):
        raise SystemExit(
            "pipe mode (`-`) converts N-Triples to N-Triples only; use file "
            "paths for other formats"
        )
    out = _pipe_out(args.output)
    n_in = n_ok = 0
    try:
        for lines in _pipe_in(args.input):
            n_in += _substantive(lines)
            t = parse_ntriples_lines(
                pa.table({"text": pa.array(lines, pa.string())}),
                on_error=args.on_error,
            )
            n_ok += t.num_rows
            for line in serialize_ntriples(t)["line"].to_pylist():
                out.write(line + "\n")
    finally:
        if out is not sys.stdout:
            out.close()
    summary = {"command": "convert", "input": args.input, "output": args.output,
               "mode": "pipe"}
    if args.on_error == "skip":
        summary["counters"] = {"parsed": n_ok, "malformed_lines": n_in - n_ok}
    print(json.dumps(summary), file=sys.stderr)


def _pipe_pseudo(args):
    import pyarrow as pa

    from .functions.crypto import new_pseudonymizer, resolve_secret
    from .functions.engine import pseudonymize_batch
    from .functions.rdf import parse_ntriples_lines, serialize_ntriples
    from .functions.rules import Rules

    if not (_pipe_is_nt(args.input) and _pipe_is_nt(args.output)):
        raise SystemExit("pipe mode (`-`) processes N-Triples only")
    rules = Rules.from_yaml(args.rules) if args.rules else Rules.from_dict({})
    if args.index and args.index.endswith(".json"):
        from .functions.tripsu_index import HashIndexMatcher, TripsuIndex

        matcher = HashIndexMatcher(rules, TripsuIndex.from_json(args.index))
    elif args.index:
        # pyarrow direct read, NOT a Ray Dataset: pipe mode must never
        # boot a (silently unconfigured) Ray session; the index is
        # driver-size by contract
        import pyarrow.parquet as _pq

        from .stages.pseudo import compile_matcher

        matcher = compile_matcher(rules, _pq.read_table(args.index).to_pandas())
    elif args.input == "-":
        # mirrors the reference, where -x is required: a pipe cannot be
        # re-read for the inline pass-1 index build
        raise SystemExit(
            "pseudo from stdin requires -x/--index (the stream cannot be "
            "re-read to build the type index inline)"
        )
    else:
        # file input with no prebuilt index: inline pass 1 by re-reading
        # the file (the graceful degradation cmd_pseudo also offers)
        import pandas as pd

        from .stages.index import _typed_pairs
        from .stages.pseudo import compile_matcher

        pairs = []
        for lines in _pipe_in(args.input):
            t = parse_ntriples_lines(
                pa.table({"text": pa.array(lines, pa.string())}),
                on_error=args.on_error,
            )
            pairs.append(_typed_pairs(t).to_pandas())
        cat = (pd.concat(pairs, ignore_index=True).drop_duplicates(ignore_index=True)
               if pairs else pd.DataFrame({"subject": [], "type": []}))
        matcher = compile_matcher(rules, cat)

    generated = False
    if args.secret_file:
        secret = open(args.secret_file, "rb").read()
        if len(secret) < 32:
            raise SystemExit("Secret must be at least 32 bytes long")
    elif args.salt is not None:
        secret = args.salt
    else:
        secret = resolve_secret(None)
        generated = True
    pseudo = new_pseudonymizer(args.algorithm, secret)

    out = _pipe_out(args.output)
    n_in = n_ok = 0
    try:
        for lines in _pipe_in(args.input):
            n_in += _substantive(lines)
            t = parse_ntriples_lines(
                pa.table({"text": pa.array(lines, pa.string())}),
                on_error=args.on_error,
            )
            n_ok += t.num_rows
            rewritten = pseudonymize_batch(t, matcher, pseudo)
            for line in serialize_ntriples(rewritten)["line"].to_pylist():
                out.write(line + "\n")
    finally:
        if out is not sys.stdout:
            out.close()
    info = {"command": "pseudo", "output": args.output, "mode": "pipe"}
    if generated:
        info["generated_secret"] = secret
    if args.on_error == "skip":
        info["counters"] = {"parsed": n_ok, "malformed_lines": n_in - n_ok}
    print(json.dumps(info), file=sys.stderr)


def cmd_convert(args):
    """Triple-format conversion: any supported input extension (.nt /
    .ntriples / .jsonl / .ndjson / .tsv / parquet dir) → any supported
    output extension — one streaming pass, no driver materialization."""
    jc, handle = _skip_counter(args.on_error)
    ds = _read_triples(args.input, args.on_error, handle)
    dropped = _write_triples(ds, args.output)
    summary = {"command": "convert", "input": args.input, "output": args.output}
    if dropped:
        summary["dropped_columns"] = dropped
    if jc is not None:
        summary["counters"] = jc.counts()
    print(json.dumps(summary))


def cmd_extract(args):
    from .sources.synth import read_source_files
    from .stages.extract import extract_triples

    import ray.data

    if args.source_files:
        src = _read_parquet_clean(args.source_files)
        out = extract_triples(src)
    else:
        out = extract_triples(read_source_files(args.sf_dir, repeat=args.repeat))
    _write_triples(out, args.output)
    print(json.dumps({"command": "extract", "output": args.output}))


def cmd_index(args):
    from .stages.index import build_type_index

    jc, handle = _skip_counter(args.on_error)
    triples = _read_triples(args.input, args.on_error, handle)
    if args.output.endswith(".json"):
        # reference-compatible {types, map} JSON (src/index.rs:111) — a
        # tripsu user can hand this to the Rust binary and vice versa
        from .functions.tripsu_index import TripsuIndex
        from .stages.index import collect_index_df

        pairs = collect_index_df(build_type_index(triples))
        TripsuIndex.from_pairs(pairs).to_json(args.output)
    else:
        build_type_index(triples).write_parquet(args.output)
    info = {"command": "index", "output": args.output}
    if jc is not None:
        info["counters"] = jc.counts()
    print(json.dumps(info))


def cmd_update(args):
    """Apply an append-only delta of source files against a CHECKPOINTED
    base run: no base recompute — the fold state loads from the base
    run's `folds` value checkpoint, the raw base triples from its
    `triples` Parquet stage, and the base output from the prior run's
    output directory. Only affected triples re-render
    (pipelines/kg.py::_incremental_from_triples)."""
    import hashlib
    import os

    from .functions.crypto import resolve_secret
    from .pipelines.kg import DEFAULT_RULES, _incremental_from_triples
    from .stages.extract import extract_triples
    from .state.checkpoint import CheckpointManager

    rules_cfg = (
        DEFAULT_RULES if not args.rules else __import__("yaml").safe_load(open(args.rules))
    )
    import pickle

    salt = resolve_secret(args.salt)
    sb = salt.encode() if isinstance(salt, str) else bytes(salt)
    salt_fp = hashlib.sha256(sb).hexdigest()[:16]

    def _check(want_fp, want_alg, want_rules=None):
        # refuse a salt OR algorithm differing from the base run's — either
        # mismatch silently produces referentially broken output (kept base
        # rows in one pseudonym space, re-rendered rows in another)
        if want_fp and want_fp != salt_fp:
            raise SystemExit("--salt does not match the base run's salt fingerprint")
        if want_alg and want_alg != args.algorithm:
            raise SystemExit(
                f"--algorithm {args.algorithm!r} differs from the base run's "
                f"{want_alg!r}"
            )
        if want_rules is not None and want_rules != rules_cfg:
            raise SystemExit("--rules differ from the base run's rules")

    chain_path = os.path.join(args.base_checkpoint, "chain.json")
    if os.path.exists(chain_path):
        # base is itself an `update --checkpoint-dir` result: chained state
        chain = json.load(open(chain_path))
        _check(chain.get("salt_fp"), chain.get("algorithm"), chain.get("rules"))
        with open(os.path.join(args.base_checkpoint, "folds.pkl"), "rb") as f:
            base_state = pickle.load(f)
        triple_dirs = chain["triple_dirs"]
        dss = [_read_parquet_clean(d) for d in triple_dirs]
        base_triples = dss[0]
        for d in dss[1:]:
            base_triples = base_triples.union(d)
    else:
        # base is a `run --checkpoint-dir` result. The pseudo manifest is
        # REQUIRED: without it the salt/algorithm guard cannot run, and an
        # update against an unverifiable base is exactly the unsafe case.
        mp = os.path.join(args.base_checkpoint, "pseudo.manifest.json")
        if not os.path.exists(mp):
            raise SystemExit(
                "base checkpoint lacks pseudo.manifest.json — cannot verify the "
                "base run's salt/algorithm; re-run `run --checkpoint-dir` to completion"
            )
        base_params = json.load(open(mp))["params"]
        _check(base_params.get("salt_fp"), base_params.get("algorithm"))
        if not args.base_sf_dir:
            raise SystemExit("--base-sf-dir is required for a `run` base checkpoint")

        ckpt = CheckpointManager(args.base_checkpoint)
        fold_params = {"sf_dir": args.base_sf_dir, "rules": rules_cfg}

        def _missing():
            raise SystemExit(
                "base checkpoint lacks a completed stage for these params — "
                "run `run --checkpoint-dir` first (same --sf-dir and rules)"
            )

        if not ckpt.is_complete("folds", fold_params):
            _missing()
        base_state = ckpt.value_stage("folds", _missing, fold_params)
        if not ckpt.is_complete("triples", {"sf_dir": args.base_sf_dir}):
            _missing()
        base_triples = ckpt.dataset_stage(
            "triples", _missing, {"sf_dir": args.base_sf_dir}
        )
        triple_dirs = [os.path.join(args.base_checkpoint, "triples")]

    base_out = _read_parquet_clean(args.base_output)
    delta_triples = extract_triples(_read_parquet_clean(args.delta)).materialize()

    out, merged_state = _incremental_from_triples(
        base_triples,
        delta_triples,
        rules_cfg=rules_cfg,
        salt=salt,
        algorithm=args.algorithm,
        base_state=base_state,
        base_out=base_out,
        return_state=True,
    )
    out.write_parquet(args.output)
    n = _read_parquet_clean(args.output).count()
    info = {"command": "update", "output": args.output, "rows": n}
    if args.checkpoint_dir:
        # persist chained state so the NEXT update builds on THIS one with
        # work ∝ its own delta: merged folds + the delta's triples parquet
        # + the list of all triple dirs so far (never a corpus rewrite)
        os.makedirs(args.checkpoint_dir, exist_ok=True)
        ddir = os.path.join(args.checkpoint_dir, "delta_triples")
        delta_triples.write_parquet(ddir)
        with open(os.path.join(args.checkpoint_dir, "folds.pkl"), "wb") as f:
            pickle.dump(merged_state, f)
        with open(os.path.join(args.checkpoint_dir, "chain.json"), "w") as f:
            json.dump(
                {
                    "triple_dirs": triple_dirs + [ddir],
                    "salt_fp": salt_fp,
                    "algorithm": args.algorithm,
                    "rules": rules_cfg,
                },
                f,
                indent=2,
            )
        info["checkpoint"] = args.checkpoint_dir
    print(json.dumps(info))


def cmd_analyze(args):
    """Graph profiling over a triple stream: degree census, predicate
    census, component sizes — the skew/partitioning reconnaissance a
    100 TB run does BEFORE choosing link-stage salts (stages/graph.py)."""
    from .stages.graph import (
        connected_components_str,
        degree_census,
        entity_edges,
        predicate_census,
    )

    jc, handle = _skip_counter(args.on_error)
    triples = _read_triples(args.input, args.on_error, handle)
    degree_census(triples).write_parquet(f"{args.output}/degrees")
    preds = predicate_census(triples).to_pandas()
    labels = connected_components_str(entity_edges(triples))
    import collections

    comp_sizes = collections.Counter(labels.values())
    info = {
        "command": "analyze",
        "output": args.output,
        "predicates": {
            r["predicate"]: int(r["n_triples"]) for _, r in preds.iterrows()
        },
        "n_edge_nodes": len(labels),
        "n_components": len(comp_sizes),
        "largest_components": [
            {"root": k, "size": int(v)} for k, v in comp_sizes.most_common(5)
        ],
    }
    if jc is not None:
        info["counters"] = jc.counts()
    print(json.dumps(info))


def cmd_pseudo(args):
    import ray
    import ray.data

    from .functions.rules import Rules
    from .stages.index import collect_index_df, type_index_pairs
    from .stages.pseudo import broadcast_matcher, compile_matcher, pseudonymize_tasks

    jc, handle = _skip_counter(args.on_error)
    triples = _read_triples(args.input, args.on_error, handle)
    rules = Rules.from_yaml(args.rules) if args.rules else Rules.from_dict({})
    matcher = None
    if args.index and args.index.endswith(".json"):
        # reference JSON index (hash-keyed): probe it directly — an index
        # file written by the Rust tripsu binary works unchanged
        from .functions.tripsu_index import HashIndexMatcher, TripsuIndex

        matcher = HashIndexMatcher(rules, TripsuIndex.from_json(args.index))
    elif args.index:
        pairs = _read_parquet_clean(args.index).to_pandas()
    else:
        # no prebuilt index: run pass 1 inline (reference requires -x; we
        # degrade gracefully by building it from the input stream)
        pairs = collect_index_df(type_index_pairs(_read_triples(args.input, args.on_error)))
    from .functions.crypto import resolve_secret

    generated = False
    if args.secret_file:
        secret = open(args.secret_file, "rb").read()
        if len(secret) < 32:
            raise SystemExit("Secret must be at least 32 bytes long")
    elif args.salt is not None:
        secret = args.salt
    else:
        # no secret given: draw ONE random secret on the driver (the
        # reference generates its random key once per process,
        # src/crypto.rs:108-109) and surface it so the run is reproducible
        secret = resolve_secret(None)
        generated = True
    if matcher is None:
        matcher = compile_matcher(rules, pairs)
    matcher_ref = broadcast_matcher(matcher)
    out = pseudonymize_tasks(
        triples, matcher_ref, algorithm=args.algorithm, secret=secret,
    )
    _write_triples(out, args.output)
    info = {"command": "pseudo", "output": args.output}
    if generated:
        info["generated_secret"] = secret
    if jc is not None:
        info["counters"] = jc.counts()
    print(json.dumps(info))


def cmd_run(args):
    from .functions.crypto import resolve_secret
    from .pipelines.kg import kg_pipeline

    # default: a driver-generated random secret, surfaced for reproducibility.
    # A well-known hardcoded salt would make sha256(salt || value) dictionary-
    # reversible for low-entropy values; deterministic salts are opt-in
    # (oracle/test fixtures pass them explicitly).
    from .state.metrics import StageLog

    generated = args.salt is None
    salt = resolve_secret(args.salt)
    log = StageLog()
    ds = kg_pipeline(
        args.sf_dir,
        output_path=args.output,
        checkpoint_dir=args.checkpoint_dir,
        salt=salt,
        algorithm=args.algorithm,
        rules_cfg=None if not args.rules else __import__("yaml").safe_load(open(args.rules)),
        stage_log=log,
    )
    info = {"command": "run", "output": args.output, "rows": ds.count(),
            "stages": log.records}
    if generated:
        info["generated_salt"] = salt
    print(json.dumps(info))


def main(argv=None):
    p = argparse.ArgumentParser(prog="tripsu-ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="source files parquet → triples")
    pe.add_argument("--source-files", default=None, help="parquet dir/file with (repo,path,commit,lang,content)")
    pe.add_argument("--sf-dir", default=None, help="testdata dir (synthesize corpus from documents.doc_id)")
    pe.add_argument("--repeat", type=int, default=1)
    pe.add_argument("-o", "--output", required=True)
    pe.set_defaults(fn=cmd_extract)

    pc = sub.add_parser("convert", help="convert triples between formats (nt/jsonl/tsv/parquet)")
    pc.add_argument("-i", "--input", required=True, help="input path (format by extension)")
    pc.add_argument("-o", "--output", required=True, help="output path (format by extension)")
    pc.add_argument("--on-error", default="raise", choices=["raise", "skip"])
    pc.set_defaults(fn=cmd_convert)

    pi = sub.add_parser("index", help="pass 1: build the rdf:type index")
    pi.add_argument("-i", "--input", required=True, help=".nt file or triples parquet dir")
    pi.add_argument("-o", "--output", required=True, help="index parquet dir")
    pi.add_argument("--on-error", default="raise", choices=["raise", "skip"])
    pi.set_defaults(fn=cmd_index)

    pp = sub.add_parser("pseudo", help="pass 2: pseudonymize the triple stream")
    pp.add_argument("-i", "--input", required=True)
    pp.add_argument("-o", "--output", required=True)
    pp.add_argument("-x", "--index", default=None, help="index parquet dir (else built inline)")
    pp.add_argument("-r", "--rules", default=None, help="rules YAML")
    pp.add_argument("-s", "--secret-file", default=None, help="file with ≥32-byte secret")
    pp.add_argument("--salt", default=None, help="salt string (sha256-salted mode)")
    pp.add_argument("--algorithm", default="sha256-salted",
                    choices=["sha256-salted", "blake2b-keyed", "blake3-keyed"])
    pp.add_argument("--on-error", default="raise", choices=["raise", "skip"])
    pp.set_defaults(fn=cmd_pseudo)

    pa = sub.add_parser("analyze", help="graph profiling: degrees, predicates, components")
    pa.add_argument("-i", "--input", required=True, help=".nt file or triples parquet dir")
    pa.add_argument("-o", "--output", required=True, help="output dir (degrees parquet)")
    pa.add_argument("--on-error", default="raise", choices=["raise", "skip"])
    pa.set_defaults(fn=cmd_analyze)

    pu = sub.add_parser("update", help="apply an append-only source delta against a checkpointed base run")
    pu.add_argument("--base-sf-dir", default=None,
                    help="the base run's --sf-dir (checkpoint lineage key; "
                         "unused when the base is a chained update checkpoint)")
    pu.add_argument("--base-checkpoint", required=True, help="the base run's --checkpoint-dir")
    pu.add_argument("--base-output", required=True, help="the base run's -o output parquet dir")
    pu.add_argument("--delta", required=True, help="parquet of NEW source files (repo,path,commit,lang,content)")
    pu.add_argument("-o", "--output", required=True)
    pu.add_argument("--salt", required=True, help="MUST equal the base run's salt (see its generated_salt)")
    pu.add_argument("--algorithm", default="sha256-salted")
    pu.add_argument("--rules", default=None)
    pu.add_argument("--checkpoint-dir", default=None,
                    help="persist chained state here so the NEXT update builds on this one")
    pu.set_defaults(fn=cmd_update)

    pr = sub.add_parser("run", help="full KG pipeline (ray-job-submit entry)")
    pr.add_argument("--sf-dir", required=True)
    pr.add_argument("-o", "--output", required=True)
    pr.add_argument("--checkpoint-dir", default=None)
    pr.add_argument("-r", "--rules", default=None)
    pr.add_argument("--salt", default=None,
                    help="deterministic salt (default: random, printed in the run summary)")
    pr.add_argument("--algorithm", default="sha256-salted")
    pr.set_defaults(fn=cmd_run)

    args = p.parse_args(argv)
    # `-` operands (reference stdin/stdout defaults, src/main.rs:34-63):
    # single-process chunked path, no Ray session
    if args.cmd == "convert" and "-" in (args.input, args.output):
        return _pipe_convert(args)
    if args.cmd == "pseudo" and "-" in (args.input, args.output):
        return _pipe_pseudo(args)
    _ray_session(args.num_cpus)
    try:
        args.fn(args)
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    main()
