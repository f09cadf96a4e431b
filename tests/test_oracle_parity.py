"""P/R of the vectorized engine vs the independent per-triple oracle.

BASELINE.json's gate is P/R ≥ 0.95 against reference-semantics triples; we
assert exact set equality (P = R = 1.0) across random graphs, random rules,
and the extracted code-KG corpus.
"""

import random

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.tripsu_oracle import build_index, process_triple
from tripsu_ray.functions.crypto import Sha256Salted
from tripsu_ray.functions.engine import CompiledMatcher, pseudonymize_batch
from tripsu_ray.functions.rdf import triples_table
from tripsu_ray.functions.rules import Rules
from tripsu_ray.schema import KIND_BLANK, KIND_IRI, KIND_LITERAL, RDF_TYPE

ENTS = [f"urn:ns/e{i}" for i in range(8)]
TYPES = [f"urn:ns/T{i}" for i in range(3)]
PREDS = [f"urn:ns/p{i}" for i in range(4)] + [RDF_TYPE]


def random_graph(rng: random.Random, n: int) -> list[dict]:
    rows = []
    for _ in range(n):
        if rng.random() < 0.5:
            s, sk = rng.choice(ENTS), KIND_IRI
        else:
            s, sk = f"b{rng.randrange(4)}", KIND_BLANK
        p = rng.choice(PREDS)
        r = rng.random()
        if p == RDF_TYPE or r < 0.4:
            o, ok, ol, od = rng.choice(TYPES if p == RDF_TYPE else ENTS), KIND_IRI, None, None
        elif r < 0.6:
            o, ok, ol, od = f"b{rng.randrange(4)}", KIND_BLANK, None, None
        elif r < 0.8:
            o, ok, ol, od = f"lit{rng.randrange(10)}", KIND_LITERAL, None, None
        elif r < 0.9:
            o, ok, ol, od = f"lit{rng.randrange(10)}", KIND_LITERAL, "en", None
        else:
            o, ok, ol, od = f"lit{rng.randrange(10)}", KIND_LITERAL, None, "urn:ns/dt"
        rows.append(
            dict(subject=s, subject_kind=sk, predicate=p, object_value=o,
                 object_kind=ok, object_lang=ol, object_datatype=od)
        )
    return rows


def random_rules(rng: random.Random) -> dict:
    return {
        "invert": rng.random() < 0.3,
        "nodes": {"of_type": [f"<{t}>" for t in rng.sample(TYPES, rng.randrange(3))]},
        "objects": {
            "on_predicate": [f"<{p}>" for p in rng.sample(PREDS[:4], rng.randrange(3))],
            "on_type_predicate": {
                f"<{rng.choice(TYPES)}>": [f"<{rng.choice(PREDS[:4])}>"]
                for _ in range(rng.randrange(3))
            },
        },
    }


def run_both(rows: list[dict], rules_cfg: dict):
    rules = Rules.from_dict(rules_cfg)
    pseudo = Sha256Salted("parity-salt")
    index = build_index(rows)
    oracle_out = [process_triple(r, rules, index, pseudo) for r in rows]
    t = triples_table(
        [
            (r["subject"], r["subject_kind"], r["predicate"], r["object_value"],
             r["object_kind"], r["object_lang"], r["object_datatype"])
            for r in rows
        ]
    )
    engine_out = pseudonymize_batch(t, CompiledMatcher(rules, index), pseudo)
    return oracle_out, engine_out.to_pylist()


def as_multiset(rows):
    from collections import Counter

    return Counter(tuple(sorted(r.items(), key=lambda kv: kv[0])) for r in rows)


@pytest.mark.parametrize("seed", range(25))
def test_engine_matches_oracle_random(seed):
    rng = random.Random(seed)
    rows = random_graph(rng, 120)
    rules_cfg = random_rules(rng)
    oracle_out, engine_out = run_both(rows, rules_cfg)
    a, b = as_multiset(oracle_out), as_multiset(engine_out)
    assert a == b  # precision = recall = 1.0
    inter = sum((a & b).values())
    assert inter / sum(a.values()) >= 0.95  # the stated P/R gate, trivially


def test_engine_matches_oracle_on_code_kg():
    """Parity on the actual extracted corpus (no Ray needed — one batch)."""
    import numpy as np

    from tripsu_ray.pipelines.kg import DEFAULT_RULES
    from tripsu_ray.sources.synth import source_files_batch
    from tripsu_ray.stages.extract import extract_batch

    triples = extract_batch(source_files_batch(np.arange(200)))
    rows = triples.to_pylist()
    oracle_out, engine_out = run_both(rows, DEFAULT_RULES)
    assert as_multiset(oracle_out) == as_multiset(engine_out)
