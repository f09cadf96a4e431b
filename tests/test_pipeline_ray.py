"""Ray Dataset pipeline tests (session-scoped Ray fixture)."""

import numpy as np
import pyarrow as pa
import pytest

from tripsu_ray.schema import KIND_IRI, KIND_LITERAL, RDF_TYPE
from tripsu_ray.sources.synth import read_source_files, source_files_batch
from tripsu_ray.stages.extract import NS, extract_batch, extract_triples
from tripsu_ray.stages.index import build_type_index, collect_index, collect_index_df, type_index_pairs
from tripsu_ray.stages.link import build_link_map, collect_link_map, link_entities
from tripsu_ray.stages.materialize import dedup_exact, materialize
from tripsu_ray.stages.pseudo import broadcast_matcher, compile_matcher, pseudonymize
from tripsu_ray.pipelines.kg import DEFAULT_RULES, DEFAULT_SALT, kg_pipeline

SF = "/root/testdata/sf0.001"


def test_extract_batch_contents():
    t = source_files_batch(np.array([1]))  # doc 1: py
    out = extract_batch(t)
    df = out.to_pandas()
    assert (df.subject_kind == KIND_IRI).all()
    preds = set(df.predicate)
    for p in ("imports", "defines", "calls", "inRepo", "language", "commitHash", "sha256", "author", "license", "name"):
        assert NS + p in preds
    imports = df[df.predicate == NS + "imports"].object_value.tolist()
    # doc 1: m1=(7+3)%50=10, m2=14%50=14, odd → no hub import
    assert sorted(imports) == ["http://kg.example/mod/mod_10", "http://kg.example/mod/mod_14"]
    # content sha256 literal present (per-row invariant)
    sha = df[df.predicate == NS + "sha256"]
    assert len(sha) == 1 and len(sha.object_value.iloc[0]) == 64
    assert (sha.object_kind == KIND_LITERAL).all()


def test_extract_hub_module_even_docs():
    out = extract_batch(source_files_batch(np.array([2]))).to_pandas()
    imports = out[out.predicate == NS + "imports"].object_value.tolist()
    assert "http://kg.example/mod/core" in imports


def test_extract_js_quirks():
    # doc 7 → js (7%7==0, not %13): imports carry the .js suffix
    out = extract_batch(source_files_batch(np.array([7]))).to_pandas()
    imports = out[out.predicate == NS + "imports"].object_value.tolist()
    assert all(m.endswith(".js") for m in imports)


@pytest.mark.usefixtures("ray_session")
class TestRayPipeline:
    def test_type_index(self):
        triples = extract_triples(read_source_files(SF))
        idx = collect_index(build_type_index(triples))
        # every file, repo, module, symbol subject is typed
        assert len(idx) > 500
        assert idx["<http://kg.example/repo/org0/repo0>"] == (f"<{NS}Repository>",)

    def test_pseudonymize_deterministic_and_consistent(self):
        triples = extract_triples(read_source_files(SF))
        pairs_df = collect_index_df(type_index_pairs(triples))
        matcher_ref = broadcast_matcher(compile_matcher(DEFAULT_RULES, pairs_df))
        out = pseudonymize(
            extract_triples(read_source_files(SF)),
            matcher_ref,
            secret="fixed-salt",
        ).to_pandas()
        # repo IRIs rewritten everywhere (subject AND object position), same hash
        as_subject = set(
            out[(out.predicate == NS + "license")].subject
        )
        as_object = set(out[out.predicate == NS + "inRepo"].object_value)
        assert as_subject == as_object  # join-consistency across positions
        # rewritten: prefix kept through the LAST '/', tail replaced by 64-hex
        assert all(len(s.rsplit("/", 1)[1]) == 64 for s in as_subject)
        # authors masked (on_predicate), language untouched
        assert not any(v.startswith("author_") for v in out[out.predicate == NS + "author"].object_value)
        assert set(out[out.predicate == NS + "language"].object_value) == {"py", "js", "rs"}
        # commitHash masked only for File subjects (on_type_predicate) — all
        # commitHash rows have File subjects here, so all are 64-hex ≠ 40-hex
        ch = out[out.predicate == NS + "commitHash"].object_value
        assert all(len(v) == 64 for v in ch)

    def test_link_map_merges_js_and_py_forms(self):
        triples = extract_triples(read_source_files(SF))
        km = collect_link_map(build_link_map(triples))
        # canonical for a module key covers mod/ and call/ surface forms
        assert "mod_10" in km
        assert km["mod_10"].startswith("http://kg.example/")

    def test_canonicalize_join_bit_equals_broadcast(self):
        """The hash-partitioned join apply (the beyond-broadcast plan the
        link module documents) is BIT-equal to the broadcast map-side
        apply, and link_and_canonicalize_auto's gate dispatches to it at
        driver_max=0 with the same rows."""
        import pandas as pd
        import ray

        from tripsu_ray.stages.link import (
            build_link_map,
            canonicalize_join,
            canonicalize_tasks,
            collect_link_map,
            link_and_canonicalize_auto,
        )

        def triples():
            return extract_triples(read_source_files(SF))

        link_ds = build_link_map(triples()).materialize()
        ref = ray.put(collect_link_map(link_ds))
        bc = canonicalize_tasks(triples(), ref).to_pandas()
        jn = canonicalize_join(triples(), link_ds, num_partitions=4).to_pandas()
        key = list(bc.columns)
        bc_s = bc.sort_values(key, ignore_index=True)
        jn_s = jn.sort_values(key, ignore_index=True)
        pd.testing.assert_frame_equal(bc_s, jn_s)
        auto = link_and_canonicalize_auto(triples, driver_max=0,
                                          num_partitions=4).to_pandas()
        pd.testing.assert_frame_equal(auto.sort_values(key, ignore_index=True), bc_s)
        auto_bc = link_and_canonicalize_auto(triples).to_pandas()
        pd.testing.assert_frame_equal(
            auto_bc.sort_values(key, ignore_index=True), bc_s
        )

    def test_mention_keys_case_insensitive_extension(self):
        import pandas as pd

        from tripsu_ray.stages.link import LINKABLE_PREFIXES, mention_keys

        iris = pd.Series(
            [
                LINKABLE_PREFIXES[0] + "Core.JS",
                LINKABLE_PREFIXES[0] + "core",
                "http://other.example/Core.JS",  # not linkable -> None
            ]
        )
        keys = mention_keys(iris)
        assert keys[0] == keys[1] == "core"  # lowercase BEFORE ext strip
        assert pd.isna(keys[2])

    def test_dedup_and_materialize(self):
        triples = extract_triples(read_source_files(SF))
        total = triples.count()
        distinct = dedup_exact(extract_triples(read_source_files(SF))).count()
        assert distinct < total
        out = kg_pipeline(SF, link=False, sort=True, salt=DEFAULT_SALT)
        df = out.to_pandas()
        assert df.duplicated().sum() == 0

    def test_full_pipeline_rowcount_stable(self):
        df = kg_pipeline(SF, salt=DEFAULT_SALT).to_pandas()
        assert len(df) == 7581  # pinned: deterministic corpus → deterministic KG

    @pytest.mark.parametrize("layout", ["bucketed", "split"])
    def test_materialize_rerun_same_output_dir(self, layout, tmp_path):
        # write_parquet appends unique file names — a rerun into the same
        # output dir must start clean, not merge with the previous run's
        # part-files (previously doubled every row on the rerun)
        out_dir = str(tmp_path / "out")
        runs = []
        for _ in range(2):
            triples = extract_triples(read_source_files(SF))
            runs.append(materialize(triples, out_dir, layout=layout).count())
        assert runs[0] == runs[1]


@pytest.mark.usefixtures("ray_session")
class TestFoldPassCompiled:
    """fold_pass_compiled (remote finalize) ≡ fold_pass + driver compile."""

    def test_equivalent_artifacts(self):
        import ray

        from tripsu_ray.pipelines.kg import DEFAULT_RULES
        from tripsu_ray.stages.folds import (
            fold_pass,
            fold_pass_compiled,
            relevant_types_of,
            risk_predicates_of,
        )
        from tripsu_ray.stages.link import LINKABLE_PREFIXES
        from tripsu_ray.stages.pseudo import compile_matcher
        from tripsu_ray.functions.engine import node_rewrites_any_prefix

        def triples():
            return extract_triples(read_source_files(SF))

        pairs_df, key_map, n, n_risk = fold_pass(
            triples(),
            relevant_types_of(DEFAULT_RULES),
            risk_predicates=risk_predicates_of(DEFAULT_RULES),
            risk_prefixes=LINKABLE_PREFIXES,
        )
        m_ref, km_ref, n2, n_risk2, node_risky2 = fold_pass_compiled(
            triples(), DEFAULT_RULES, link_prefixes=LINKABLE_PREFIXES
        )
        assert (n, n_risk) == (n2, n_risk2)
        assert ray.get(km_ref) == key_map
        a = compile_matcher(DEFAULT_RULES, pairs_df)
        b = ray.get(m_ref)
        assert a._sensitive.sort() == b._sensitive.sort()
        assert a._on_pred == b._on_pred
        assert len(a._otp_groups) == len(b._otp_groups)
        for (sa, pa_), (sb, pb) in zip(a._otp_groups, b._otp_groups):
            assert sa.sort() == sb.sort() and pa_ == pb
        assert node_rewrites_any_prefix(a, LINKABLE_PREFIXES) == node_risky2

    def test_fold_pass_sided_equals_two_fold_passes(self):
        """One tagged scan (fold_pass_sided) ≡ fold_pass per filtered
        side — the incremental pipeline's fused pass-1."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        from tripsu_ray.pipelines.kg import DEFAULT_RULES
        from tripsu_ray.stages.folds import (
            fold_pass,
            fold_pass_sided,
            relevant_types_of,
            risk_predicates_of,
        )
        from tripsu_ray.stages.link import LINKABLE_PREFIXES

        rt = relevant_types_of(DEFAULT_RULES)
        rp = risk_predicates_of(DEFAULT_RULES)

        def tag(b: pa.Table) -> pa.Table:
            # deterministic ~25% delta split on subject hash
            h = pd.util.hash_array(
                b["subject"].to_numpy(zero_copy_only=False)
            ) % 4
            return b.append_column(
                "_delta", pa.array((h == 0).astype(np.int8))
            )

        tagged = extract_triples(read_source_files(SF)).map_batches(
            tag, batch_format="pyarrow"
        ).materialize()
        got0, got1 = fold_pass_sided(
            tagged, rt, side_col="_delta",
            risk_predicates=rp, risk_prefixes=LINKABLE_PREFIXES,
        )

        def side(flag):
            return tagged.map_batches(
                lambda b, _f=flag: b.filter(
                    pc.equal(b["_delta"], _f)
                ).drop_columns(["_delta"]),
                batch_format="pyarrow",
            )

        for got, flag in ((got0, 0), (got1, 1)):
            pairs, key_map, n, n_risk = fold_pass(
                side(flag), rt, risk_predicates=rp,
                risk_prefixes=LINKABLE_PREFIXES,
            )
            gp, gm, gn, gr = got
            assert (gn, gr) == (n, n_risk)
            assert gm == key_map
            key = lambda df: sorted(map(tuple, df.to_numpy()))  # noqa: E731
            assert key(gp) == key(pairs)
        assert got1[2] > 0 and got0[2] > got1[2]  # both sides non-trivial


@pytest.mark.usefixtures("ray_session")
class TestTreeFoldEmptyBlocks:
    """Ray emits 0-row blocks with an EMPTY schema (no columns) out of
    map_batches when the input block was empty; the tree fold must drop
    them instead of feeding them to column-based combines (crashed
    dedup_embedding's label propagation at sf0.1)."""

    def test_empty_schema_blocks_filtered(self):
        import pandas as pd
        import ray.data

        from tripsu_ray.stages.folds import tree_fold_tables

        ds = ray.data.from_pandas(
            [
                pd.DataFrame({"a": [5, 1], "b": [2, 2]}),
                pd.DataFrame(
                    {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
                ),
                pd.DataFrame({"a": [3], "b": [2]}),
            ]
        )

        def step(df):
            return pd.DataFrame({"k": df["b"], "v": df["a"]})

        def combine(frames):
            df = pd.concat(frames, ignore_index=True)
            return df.groupby("k", sort=False, as_index=False)["v"].min()

        out = tree_fold_tables(ds.map_batches(step, batch_format="pandas"), combine)
        assert out.values.tolist() == [[2, 1]]

    def test_all_empty_returns_none(self):
        import pandas as pd
        import ray.data

        from tripsu_ray.stages.folds import tree_fold_tables

        ds = ray.data.from_pandas(
            [pd.DataFrame({"a": pd.Series([], dtype="int64")})]
        )

        def step(df):
            return pd.DataFrame({"k": df["a"]})

        out = tree_fold_tables(
            ds.map_batches(step, batch_format="pandas"),
            lambda fs: pd.concat(fs, ignore_index=True),
        )
        assert out is None or len(out) == 0


@pytest.mark.usefixtures("ray_session")
class TestPartitionedHotHashes:
    """Range-partitioned census must handle every power-of-two partition
    count — num_partitions=1 makes leaf remotes return a bare ObjectRef
    (num_returns=1), a previously-crashing path."""

    @pytest.mark.parametrize("num_partitions", [1, 2, 16])
    def test_matches_numpy_reference(self, num_partitions):
        import numpy as np
        import pyarrow as pa
        import ray

        from tripsu_ray.stages.folds import partitioned_hot_hashes

        rng = np.random.default_rng(11)
        blocks = [
            rng.integers(0, 2**63, size=500, dtype=np.int64).astype(np.uint64)
            for _ in range(5)
        ]
        blocks[1][:100] = blocks[0][:100]  # guaranteed cross-block dups
        refs = [ray.put(pa.table({"_h": b})) for b in blocks]
        hot = partitioned_hot_hashes(refs, num_partitions=num_partitions)
        allv = np.concatenate(blocks)
        uniq, cnt = np.unique(allv, return_counts=True)
        expect = uniq[cnt > 1]
        assert (np.sort(hot) == expect).all()

    def test_rejects_non_power_of_two(self):
        with pytest.raises(ValueError):
            from tripsu_ray.stages.folds import partitioned_hot_hashes

            partitioned_hot_hashes([], num_partitions=3)


class TestJoinFallback:
    """pseudonymize_join (huge-index plan) ≡ broadcast plan, bit for bit."""

    def _both(self, rules_cfg, num_partitions: int = 4):
        from tripsu_ray.stages.folds import fold_pass, relevant_types_of
        from tripsu_ray.stages.index import type_index_pairs
        from tripsu_ray.stages.pseudo import (
            broadcast_matcher,
            compile_matcher,
            pseudonymize_join,
            pseudonymize_tasks,
        )

        def triples():
            return extract_triples(read_source_files(SF))

        pairs_df, _, _, _ = fold_pass(triples(), relevant_types_of(rules_cfg))
        ref = broadcast_matcher(compile_matcher(rules_cfg, pairs_df))
        a = pseudonymize_tasks(triples(), ref, secret="s").to_pandas()
        b = pseudonymize_join(
            triples(), rules_cfg, type_index_pairs(triples()), secret="s",
            num_partitions=num_partitions,
        ).to_pandas()
        key = ["subject", "subject_kind", "predicate", "object_value", "object_kind"]
        return (
            sorted(map(tuple, a[key].values.tolist())),
            sorted(map(tuple, b[key].values.tolist())),
        )

    def test_default_rules(self):
        a, b = self._both(DEFAULT_RULES)
        assert a == b

    def test_inverted_rules(self):
        a, b = self._both({**DEFAULT_RULES, "invert": True})
        assert a == b

    def test_many_partitions(self):
        # num_partitions ≫ distinct right keys leaves empty shards — the
        # regime where Ray 2.49's Dataset.join backend broke (and why the
        # plan now uses grouped is_in probes)
        a, b = self._both(DEFAULT_RULES, num_partitions=32)
        assert a == b

    def test_single_partition(self):
        # num_returns=1 remotes return a bare ObjectRef — previously
        # crashed _shard_keys' per-partition indexing
        a, b = self._both(DEFAULT_RULES, num_partitions=1)
        assert a == b

    def test_flag_pass_single_partition_no_bloom(self):
        import pyarrow as pa
        import ray
        import ray.data

        from tripsu_ray.stages.pseudo import _flag_pass

        stream = ray.data.from_arrow(
            pa.table({"k": pa.array(["a", "b", "a", "c"], pa.string())})
        )
        shard = ray.put(pa.array(["a", "c"], pa.string()))
        out = _flag_pass(
            stream, "k", [("k", "_f", [shard])], 1, blooms=None
        ).to_pandas()
        got = dict(zip(out.k, out._f))
        assert got == {"a": True, "b": False, "c": True}


@pytest.mark.usefixtures("ray_session")
def test_pipeline_blake2b_algorithm():
    """The pluggable-algorithm path (tripsu-shaped keyed hash) end to end."""
    secret = "0123456789abcdef0123456789abcdef"  # ≥32 bytes
    a = kg_pipeline(SF, algorithm="blake2b-keyed", salt=secret, link=False, sort=False).to_pandas()
    b = kg_pipeline(SF, algorithm="sha256-salted", salt=secret, link=False, sort=False).to_pandas()
    assert len(a) == len(b)  # same structure
    # same rows masked, different digests
    assert set(a.predicate) == set(b.predicate)
    ia = set(a[a.predicate == NS + "author"].object_value)
    ib = set(b[b.predicate == NS + "author"].object_value)
    assert ia.isdisjoint(ib) and all(len(v) == 64 for v in ia | ib)


@pytest.mark.usefixtures("ray_session")
def test_stage_log_records_barriers(tmp_path):
    """Structured per-stage logging (src/log.rs parity): one record per
    pipeline barrier with wall time + counts, JSON-lines when enabled."""
    import io
    import json

    from tripsu_ray.state.metrics import StageLog

    stream = io.StringIO()
    log = StageLog(enabled=True, stream=stream)
    out = str(tmp_path / "kg_out")
    kg_pipeline(SF, salt=DEFAULT_SALT, output_path=out, stage_log=log)

    by_name = {r["stage"]: r for r in log.records}
    fold = by_name["fold_index_linkmap"]
    # "messages processed" parity (src/log.rs): every raw triple seen in
    # pass 1, BEFORE dedup (sf0.001 emits 10000 raw / 7632 distinct)
    assert fold["triples"] == 10000 and fold["wall_s"] > 0
    assert "risk_rows" in fold and not fold["checkpointed"]
    mat = by_name["materialize"]
    assert mat["layout"] == "split" and mat["blocking"] and mat["wall_s"] > 0
    # live emission: one parseable JSON line per record, same content
    lines = [json.loads(l) for l in stream.getvalue().splitlines()]
    assert lines == log.records


@pytest.mark.usefixtures("ray_session")
class TestIncremental:
    """incremental_update ≡ full recompute, including the two paths where a
    base triple's rendering actually changes (new type pair; changed
    canonical)."""

    @staticmethod
    def _src(df):
        import ray.data

        from tripsu_ray.schema import SOURCE_FILES

        return ray.data.from_arrow(
            pa.Table.from_pandas(df, schema=SOURCE_FILES, preserve_index=False)
        )

    @staticmethod
    def _sorted(ds):
        df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
        return df.sort_values(
            ["subject", "predicate", "object_value", "object_kind"],
            ignore_index=True,
        )

    def test_handcrafted_canonical_change(self):
        import pandas as pd

        from tripsu_ray.pipelines.kg import incremental_update

        base = pd.DataFrame(
            {
                "repo": ["org/r1", "org/r1", "org/r2"],
                "path": ["a.py", "b.py", "c.py"],
                "commit": ["c1", "c2", "c3"],
                "lang": ["py", "py", "py"],
                "content": [
                    "# Author: Ann\nimport zebra_mod\ndef f():\n    pass\n",
                    "import zebra_mod\nimport other_mod\n",
                    "# License: MIT\nclass C:\n    pass\n",
                ],
            }
        )
        delta = pd.DataFrame(
            {
                "repo": ["org/r1", "org/r3"],
                "path": ["d.py", "e.py"],
                "commit": ["c4", "c5"],
                "lang": ["py", "py"],
                "content": [
                    # adds call/zebra_mod: "call/" < "mod/" so the canonical
                    # for key zebra_mod CHANGES — base a.py/b.py import
                    # triples must re-render to the new canonical
                    "def g():\n    zebra_mod.run()\n",
                    # brand-new repo: new Repository type pair (of_type path)
                    "# Author: Bob\nimport zzz\n",
                ],
            }
        )
        inc = self._sorted(
            incremental_update(self._src(base), self._src(delta), salt=DEFAULT_SALT)
        )
        full = self._sorted(
            kg_pipeline(
                "", source_ds=self._src(pd.concat([base, delta], ignore_index=True)),
                salt=DEFAULT_SALT, sort=False,
            )
        )
        import pandas as pd2

        pd2.testing.assert_frame_equal(inc, full)
        # the canonical-change path genuinely fired: the old canonical
        # mod/zebra_mod is gone, the new one is referenced by base files
        objs = set(full["object_value"])
        assert "http://kg.example/call/zebra_mod" in objs
        assert "http://kg.example/mod/zebra_mod" not in objs

    @pytest.mark.parametrize("delta_mod", [2, 5])
    def test_corpus_split_equals_full(self, delta_mod):
        from tripsu_ray.pipelines.kg import kg_pipeline_incremental

        inc = self._sorted(
            kg_pipeline_incremental(SF, salt=DEFAULT_SALT, delta_mod=delta_mod)
        )
        full = self._sorted(kg_pipeline(SF, salt=DEFAULT_SALT, sort=False))
        import pandas as pd

        pd.testing.assert_frame_equal(inc, full)


@pytest.mark.usefixtures("ray_session")
def test_code_stats_comment_counting():
    """Indented #-and-// comments count; a line lacking its trailing
    newline is NOT counted as a line (n_lines = newline count — the
    documented convention shared with the oracle)."""
    import pandas as pd
    import ray.data as rd

    from tripsu_ray.stages.extract import code_stats

    df = pd.DataFrame(
        {
            "repo": ["r1", "r1", "r2"],
            "path": ["a.py", "b.py", "c.rs"],
            "commit": ["x", "y", "z"],
            "lang": ["py", "py", "rs"],
            "content": [
                "# top\ncode()\n    # indented\n",     # 3 lines, 2 comments
                "code()\nmore()",                        # 1 newline, 0 comments
                "// c\nfn x() {}\n",                    # 2 lines, 1 comment
            ],
        }
    )
    got = code_stats(rd.from_pandas(df).repartition(2)).set_index(["repo", "lang"])
    assert got.loc[("r1", "py"), "n_files"] == 2
    assert got.loc[("r1", "py"), "n_lines"] == 4
    assert got.loc[("r1", "py"), "n_comment_lines"] == 2
    assert got.loc[("r1", "py"), "comment_ratio_q"] == 500_000
    assert got.loc[("r2", "rs"), "avg_lines_q"] == 2_000_000


@pytest.mark.usefixtures("ray_session")
def test_code_stats_zero_newline_group():
    """A (repo, lang) group whose files all lack trailing newlines has
    n_lines == 0; the ratio denominator is clipped to 1 (engine and the
    greatest(...,1) oracle agree) instead of raising on int64 inf."""
    import pandas as pd
    import ray.data as rd

    from tripsu_ray.stages.extract import code_stats

    df = pd.DataFrame(
        {
            "repo": ["r0"],
            "path": ["a.py"],
            "commit": ["x"],
            "lang": ["py"],
            "content": ["code_without_newline()"],
        }
    )
    got = code_stats(rd.from_pandas(df)).set_index(["repo", "lang"])
    assert got.loc[("r0", "py"), "n_lines"] == 0
    assert got.loc[("r0", "py"), "comment_ratio_q"] == 0
    assert got.loc[("r0", "py"), "avg_lines_q"] == 0
