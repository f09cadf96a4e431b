"""Edit-distance ≤1 similarity join (stages/editjoin.py): the O(len)
verify kernel vs a full DP reference, and the distributed deletion-
neighborhood join vs brute force on random corpora."""

from __future__ import annotations

import itertools
import random

import pandas as pd
import pytest

from tripsu_ray.stages.editjoin import _deletion_keys, _lev_le1, edit_distance_pairs


def _lev(a: str, b: str) -> int:
    """Classic DP Levenshtein (reference)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _rand_names(rng: random.Random, n: int) -> list[str]:
    base = ["mod", "core", "lib", "pkg"]
    out = set()
    while len(out) < n:
        nm = rng.choice(base) + "_" + str(rng.randrange(30))
        if rng.random() < 0.3:
            nm += rng.choice([".js", ".py", ""])
        # random mutation to create near-misses
        if nm and rng.random() < 0.4:
            i = rng.randrange(len(nm))
            op = rng.randrange(3)
            if op == 0:
                nm = nm[:i] + nm[i + 1 :]
            elif op == 1:
                nm = nm[:i] + rng.choice("abcxyz_") + nm[i + 1 :]
            else:
                nm = nm[:i] + rng.choice("abcxyz_") + nm[i:]
        if nm:
            out.add(nm)
    return sorted(out)


class TestKernel:
    def test_lev_le1_matches_dp_exhaustive(self):
        alphabet = "abc"
        words = [""]
        for ln in (1, 2, 3):
            words += ["".join(w) for w in itertools.product(alphabet, repeat=ln)]
        for a in words:
            for b in words:
                if a != b:
                    assert _lev_le1(a, b) == (_lev(a, b) <= 1), (a, b)

    def test_symspell_completeness_random(self):
        # lev(a,b) <= 1  =>  deletion neighborhoods intersect (the
        # completeness direction the bucketing relies on). The converse is
        # FALSE — a transposition like core_12/core_21 shares the deletion
        # key core_2 at lev 2 — which is exactly why the per-bucket exact
        # verify exists; assert such a false candidate occurs.
        rng = random.Random(11)
        names = _rand_names(rng, 120)
        false_candidates = 0
        for a, b in itertools.combinations(names, 2):
            share = bool(_deletion_keys(a) & _deletion_keys(b))
            if _lev(a, b) <= 1:
                assert share, (a, b)
            elif share:
                false_candidates += 1
        assert bool(_deletion_keys("core_12") & _deletion_keys("core_21"))
        assert _lev("core_12", "core_21") == 2
        assert false_candidates > 0


@pytest.mark.usefixtures("ray_session")
class TestDistributedJoin:
    def _run(self, names: list[str], blocks: int = 4) -> pd.DataFrame:
        import ray.data

        ds = ray.data.from_pandas(
            pd.DataFrame({"name": pd.Series(names, dtype=object)})
        ).repartition(blocks)
        return (
            edit_distance_pairs(ds, num_partitions=8)
            .to_pandas()
            .sort_values(["name_a", "name_b"], ignore_index=True)
        )

    def test_matches_brute_force(self):
        rng = random.Random(5)
        names = _rand_names(rng, 150)
        got = self._run(names)
        want = pd.DataFrame(
            [
                (a, b)
                for a, b in itertools.combinations(sorted(names), 2)
                if _lev(a, b) <= 1
            ],
            columns=["name_a", "name_b"],
        )
        pd.testing.assert_frame_equal(got, want)

    def test_exactly_once_with_duplicated_input(self):
        # duplicate rows across blocks: distinct stage must collapse them,
        # and multi-bucket collisions must not duplicate a pair
        names = ["alpha", "alphb", "alph", "alpha"] * 3
        got = self._run(names, blocks=3)
        want = pd.DataFrame(
            {"name_a": ["alph", "alph", "alpha"], "name_b": ["alpha", "alphb", "alphb"]}
        )
        pd.testing.assert_frame_equal(got, want)

    def test_no_pairs(self):
        import ray.data

        ds = ray.data.from_pandas(
            pd.DataFrame({"name": pd.Series(["aaaa", "bbbb", "cccc"], dtype=object)})
        ).repartition(4)  # more blocks than rows → schema-less empty blocks
        assert edit_distance_pairs(ds, num_partitions=8).count() == 0
