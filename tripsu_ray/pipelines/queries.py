"""Driver-facing query implementations (one per pipeline stage).

Each function takes ``sf_dir`` and returns a Dataset / DataFrame whose
columns match the corresponding oracle SQL in ``pipelines.oracle`` exactly
(names AND value domains) — the driver compares them order-insensitively.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.crypto import content_sha256
from ..sources.synth import read_source_files
from ..stages.extract import extract_triples
from ..stages.index import build_type_index, collect_index_df, type_index_pairs
from ..stages.link import build_link_map
from ..stages.materialize import dedup_exact
from ..stages.pseudo import broadcast_matcher, compile_matcher, pseudonymize
from .kg import DEFAULT_RULES, DEFAULT_SALT, kg_pipeline

_KIND_LABELS = np.array(["iri", "blank", "literal"], dtype=object)


def _labeled_view(triples_ds):
    """TRIPLES Dataset → (subject, predicate, object_value, object_kind-label)."""

    def to_view(batch: pa.Table) -> pa.Table:
        kind = batch["object_kind"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "subject": batch["subject"],
                "predicate": batch["predicate"],
                "object_value": batch["object_value"],
                "object_kind": pa.array(_KIND_LABELS[kind], pa.string()),
            }
        )

    return triples_ds.map_batches(to_view, batch_format="pyarrow")


def _strip_brackets(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    for c in df.columns:
        df[c] = df[c].str.slice(1, -1)  # "<iri>" → "iri" (corpus has no blanks)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_source_files(sf_dir: str):
    def project(batch: pa.Table) -> pa.Table:
        sha = pa.array(
            content_sha256(np.array(batch["content"].to_pylist(), dtype=object)),
            pa.string(),
        )
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "commit": batch["commit"],
                "lang": batch["lang"],
                "content_sha256": sha,
            }
        )

    return read_source_files(sf_dir).map_batches(project, batch_format="pyarrow")


# Both caches key on sf_dir alone and therefore ASSUME the parquet under
# sf_dir is immutable for the life of the process (true for the driver
# gate and bench; tests that rewrite a tmp dir must use a fresh path —
# cf. cluster._TOP_COMPONENT_CACHE which carries a file fingerprint
# because its tmp-dir reuse risk is real).
_EXTRACT_CACHE: dict[str, object] = {}
_EDGES_CACHE: dict[str, object] = {}


def _rightsized(ds, *, rows_per_block: int = 2500, min_blocks: int = 4,
                max_blocks: int = 64):
    """Materialize + clamp block count to the data size. Ray Data's fixed
    per-block cost (task scheduling + the sort shuffle's per-block term)
    dominates tiny inputs: a 3k-row edge set left in 32 near-empty blocks
    made every downstream exchange ~5× slower than the same op on 4
    blocks. Right-sizing once at the shared input pays off across every
    consumer; at real scale rows_per_block keeps blocks ≥ CPU count."""
    ds = ds.materialize()
    n = ds.count()
    want = max(min_blocks, min(max_blocks, n // rows_per_block + 1))
    if ds.num_blocks() > want * 2:
        ds = ds.repartition(want).materialize()
    return ds


def _entity_edges(sf_dir: str):
    """Memoized, right-sized entity-edge set — the shared input of every
    graph query (same rationale as _extracted: the gate runs ~20 graph
    queries; the edge projection + distinct exchange must not re-run per
    query, and its blocks must match its size)."""
    ds = _EDGES_CACHE.get(sf_dir)
    if ds is None:
        from ..stages.graph import entity_edges

        ds = _rightsized(entity_edges(_extracted(sf_dir)))
        _EDGES_CACHE[sf_dir] = ds
    return ds


def _extracted(sf_dir: str):
    """The extracted KG triple stream — the shared input of every kg_*
    query. Within one driver session the MATERIALIZED stream is memoized
    per sf_dir: the correctness gate runs ~80 kg queries back to back, and
    a shared scan must not be re-paid per query (the blocks live in the
    object store and are reused zero-copy). Flagship pipelines that want
    scan fusion instead (bench.py) build their own stream."""
    ds = _EXTRACT_CACHE.get(sf_dir)
    if ds is None:
        ds = extract_triples(read_source_files(sf_dir)).materialize()
        _EXTRACT_CACHE[sf_dir] = ds
    return ds


def q_extract(sf_dir: str):
    return _labeled_view(dedup_exact(_extracted(sf_dir)))


def q_type_index(sf_dir: str):
    idx = build_type_index(_extracted(sf_dir))
    return idx.map_batches(_strip_brackets, batch_format="pyarrow")


def _pseudonymized(sf_dir: str):
    pairs_df = collect_index_df(type_index_pairs(_extracted(sf_dir)))
    matcher_ref = broadcast_matcher(compile_matcher(DEFAULT_RULES, pairs_df))
    return pseudonymize(_extracted(sf_dir), matcher_ref, secret=DEFAULT_SALT)


def q_pseudo(sf_dir: str):
    return _labeled_view(dedup_exact(_pseudonymized(sf_dir)))


def q_link_map(sf_dir: str):
    return build_link_map(_pseudonymized(sf_dir))


def q_pipeline(sf_dir: str):
    return _labeled_view(kg_pipeline(sf_dir, sort=False, salt=DEFAULT_SALT))


def q_incremental(sf_dir: str):
    """Incremental KG update (base split + append-only delta, affected-only
    re-rendering — pipelines/kg.py::kg_pipeline_incremental). The oracle is
    the SAME full-corpus SQL as kg_pipeline: a hash-match PROVES the
    incremental plan equals a full recompute."""
    from .kg import kg_pipeline_incremental

    return _labeled_view(
        kg_pipeline_incremental(sf_dir, salt=DEFAULT_SALT, sort=False)
    )


def q_degrees(sf_dir: str):
    """Per-subject out-degree / distinct-predicate census over the distinct
    extracted triples (one subject-hash shuffle — stages/graph.py)."""
    from ..stages.graph import degree_census

    return degree_census(_extracted(sf_dir))


def q_pred_census(sf_dir: str):
    """Per-predicate triple + distinct-subject counts (subject-partitioned
    partials compose exactly; see stages/graph.py)."""
    from ..stages.graph import predicate_census

    return predicate_census(_extracted(sf_dir))


def q_components(sf_dir: str):
    """Connected components of the IRI→IRI entity graph (rdf:type edges
    excluded) via distributed string min-label propagation — the edge set
    never materializes on the driver. Oracle: recursive-CTE reachability
    closure (exact at sf≤0.01 scale; the Ray plan is the scale path)."""
    from ..stages.graph import components_table, entity_edges

    return components_table(_entity_edges(sf_dir))


def q_lpa_communities(sf_dir: str):
    """Deterministic synchronous label-propagation communities over the
    entity graph (stages/graph.py::lpa_communities, 4 unrolled rounds —
    the community-detection family member beside components/pagerank)."""
    from ..stages.graph import lpa_communities

    return lpa_communities(_entity_edges(sf_dir))


def q_co_neighbors(sf_dir: str):
    """Distinct co-neighbor counts over the entity graph — files sharing
    an import/call target (string-keyed distributed self-join on the
    shared target; stages/graph.py::co_neighbor_counts)."""
    from ..stages.graph import co_neighbor_counts, entity_edges

    return co_neighbor_counts(_entity_edges(sf_dir))


def q_butterflies(sf_dir: str):
    """Per-file butterfly counts (bipartite 4-cycles — pairs of files
    agreeing on ≥2 shared targets) over the entity graph
    (stages/graph.py::butterfly_counts). The degree-census-derived hub
    cap is the wired DEFAULT (exact-by-default was quadratic in hub
    degree — VERDICT r2); the SQL oracle applies the identical rank rule,
    so the capped statistic is still hash-checked."""
    from ..stages.graph import butterfly_counts, entity_edges

    return butterfly_counts(_entity_edges(sf_dir), hub_cap="auto")


def q_core_numbers(sf_dir: str):
    """Exact coreness of every entity-graph node via the iterated-H-index
    fixpoint (stages/graph.py::core_numbers — one adjacency shuffle, then
    map-only rounds). Oracle: unrolled H-index rounds in SQL
    (oracle.sql_core_numbers — idempotent at the fixpoint, so a fixed
    unroll count past convergence is exact); tests additionally assert
    exact equality vs sequential peeling."""
    from ..stages.graph import core_numbers, entity_edges

    return core_numbers(_entity_edges(sf_dir))


def q_bfs(sf_dir: str):
    """Hop distances from the lexicographically smallest entity node
    (level-synchronous frontier BFS — stages/graph.py::bfs_distances).
    Oracle: capped recursive-CTE walk with min(dist) — exact while true
    eccentricity < the cap; the Ray side RAISES if its frontier outlives
    the cap, so a silent capped-but-agreeing hash-match cannot happen."""
    from ..stages.graph import bfs_distances, entity_edges

    return bfs_distances(_entity_edges(sf_dir))


def q_eccentricity(sf_dir: str):
    """Per-seed eccentricity + reach census (diameter lower-bound probe)
    from the 4 lexicographically smallest entity nodes — ONE shared
    multi-source BFS frontier (stages/graph.py::eccentricity_census).
    Oracle: seed-tagged capped recursive-CTE walk, max/count per seed
    (same raise-past-cap honesty contract as kg_bfs)."""
    from ..stages.graph import eccentricity_census

    return eccentricity_census(_entity_edges(sf_dir))


def q_validate(sf_dir: str):
    """SHACL-lite conformance census over the extracted KG: 8 shape
    constraints (cardinality, domain/range, datatype) judged in ONE
    node-partitioned exchange (stages/validate.py). Output is the census
    (constraint_name, n_checked, n_violations) — the synthetic corpus
    deliberately violates the single-author / single-license repo shapes,
    so both zero and non-zero rows are exercised."""
    from ..stages.validate import validate_graph

    return validate_graph(_extracted(sf_dir))


def q_repo_profile(sf_dir: str):
    """Per-repo 2-hop neighborhood profile (distinct files / languages /
    imported modules / defined symbols) — two hash exchanges, no
    broadcast (stages/graph.py::repo_profile)."""
    from ..stages.graph import repo_profile

    return repo_profile(_extracted(sf_dir))


def q_random_walks(sf_dir: str):
    """Deterministic node2vec-style walk corpus over the entity graph
    (stages/graph.py::random_walks — sha256-seeded walks, xor-hash step
    choice, one exchange per step). Hash-checked: oracle.sql_random_walks
    unrolls the identical seed + step formula (moved from rows-only in
    round 3); tests additionally replay it sequentially."""
    from ..stages.graph import entity_edges, random_walks

    return random_walks(_entity_edges(sf_dir))


def q_char_sets(sf_dir: str):
    """Characteristic-set census (Neumann & Moerkotte ICDE'11 — RDF
    structure summary for cardinality estimation): subjects grouped by
    their exact distinct-predicate set (stages/graph.py)."""
    from ..stages.graph import characteristic_sets

    return characteristic_sets(_extracted(sf_dir))


def q_typo_candidates(sf_dir: str):
    """Typosquat-candidate pairs: distinct Module local names within
    Levenshtein distance 1 of each other (SymSpell deletion-neighborhood
    join — stages/editjoin.py; no all-pairs scan). Oracle: DuckDB
    ``levenshtein`` over the distinct-name self-join."""
    import pyarrow as pa

    from ..schema import RDF_TYPE
    from ..stages.editjoin import edit_distance_pairs
    from ..stages.extract import NS

    def module_names(batch: pa.Table) -> pd.DataFrame:
        import pandas as pd

        p = batch["predicate"].to_numpy(zero_copy_only=False)
        o = batch["object_value"].to_numpy(zero_copy_only=False)
        s = batch["subject"].to_numpy(zero_copy_only=False)
        mods = s[(p == RDF_TYPE) & (o == NS + "Module")]
        names = [m.rsplit("/", 1)[-1] for m in mods.tolist()]
        return pd.DataFrame({"name": pd.Series(names, dtype=object)})

    names = _extracted(sf_dir).map_batches(module_names, batch_format="pyarrow")
    return edit_distance_pairs(names)


def q_pagerank(sf_dir: str, *, top_k: int = 50):
    """Top-k PageRank entities of the KG — the QUANTIZED integer power
    iteration (stages/graph.py::pagerank_quantized; 8 rounds), size-gated
    to the co-partitioned join plan beyond driver memory
    (pagerank_auto). Every per-round quantity is an integer, so the
    unrolled-CTE SQL oracle (oracle.sql_pagerank_q) hash-matches exactly
    — closing the round-2 'no SQL oracle' gap. The float variant
    (graph.pagerank) remains for tolerance-based consumers."""
    from ..stages.graph import entity_edges, pagerank_auto

    out = pagerank_auto(_entity_edges(sf_dir)).head(top_k)
    return out.reset_index(drop=True)


def q_hits(sf_dir: str):
    """HITS hubs & authorities over the entity graph — the QUANTIZED
    integer mutual reinforcement (stages/graph.py::hits_quantized;
    4 rounds, L1-normalized), size-gated to the co-partitioned union-tag
    plan beyond driver memory (hits_auto). Every per-round quantity is an
    integer, so the unrolled-CTE SQL oracle (oracle.sql_hits_q)
    hash-matches exactly — PageRank's sibling centrality, same quantized
    discipline."""
    from ..stages.graph import hits_auto

    return hits_auto(_entity_edges(sf_dir))


def q_rdfs_types(sf_dir: str):
    """RDFS subclass inference (rule rdfs9) over the extracted KG: the
    per-type distinct-subject census AFTER materializing inferred types
    from a 7-edge demo ontology (Function/Class ⊑ Symbol ⊑ Entity;
    File/Repository/Module ⊑ Resource ⊑ Entity). Ontology closure on the
    driver (class vocabularies are query-text-sized), broadcast once; ONE
    map pass + ONE pair-hash exchange (stages/infer.py). Recursive-CTE
    closure oracle."""
    from ..stages.extract import NS
    from ..stages.infer import default_ontology, rdfs_type_census

    return rdfs_type_census(_extracted(sf_dir), default_ontology(NS))


#: the graph-diff perturbation (one spec, two renderings — see
#: sql_graph_diff): drop files with d % 9 == 5, append one import to
#: files with d % 9 == 0
DIFF_EXTRA = {
    "py": "import extra_dep\n",
    "js": "const x = require('extra_dep.js');\n",
    "rs": "use extra_dep;\n",
}


def q_graph_diff(sf_dir: str, *, num_partitions: int = 16):
    """Snapshot graph diff — which triples did a corpus change add/remove?

    The v2 corpus derives deterministically from v1 (files d%9==5 deleted,
    one import appended to files d%9==0); both extract in parallel and the
    DISTINCT triple sets symmetric-diff in ONE co-partitioned exchange
    (stages/diff.py::symmetric_diff — common triples die in their
    partition, only the diff leaves). Output (s, p, o, side). EXCEPT-both-
    ways oracle."""
    import pandas as pd

    from ..stages.diff import symmetric_diff

    def perturb(df):
        d = df["path"].str.extract(r"mod_(\d+)\.")[0].astype("int64")
        keep = (d % 9) != 5
        df = df[keep].copy()
        d = d[keep]
        m = (d % 9) == 0
        df.loc[m, "content"] = df.loc[m, "content"] + df.loc[m, "lang"].map(DIFF_EXTRA)
        return df

    def spo(df):
        import pandas as pd

        return pd.DataFrame(
            {
                "s": df["subject"].astype(object),
                "p": df["predicate"].astype(object),
                "o": df["object_value"].astype(object),
            }
        )

    base = _extracted(sf_dir).map_batches(spo, batch_format="pandas")
    v2 = extract_triples(
        read_source_files(sf_dir).map_batches(perturb, batch_format="pandas")
    ).map_batches(spo, batch_format="pandas")
    return symmetric_diff(base, v2, ["s", "p", "o"], num_partitions=num_partitions)


def q_link_scores(sf_dir: str):
    """Neighborhood-overlap link prediction over the entity graph: exact
    (n_common, n_union) integers per candidate file pair sharing ≥2
    targets (stages/graph.py::neighbor_overlap_scores — the Jaccard
    numerator/denominator as rationals, one target exchange + one pair
    exchange + a degree tree-fold)."""
    from ..stages.graph import entity_edges, neighbor_overlap_scores

    return neighbor_overlap_scores(_entity_edges(sf_dir), min_common=2)


def q_code_stats(sf_dir: str):
    """Per-(repo, lang) code-shape profile: files/lines/comment lines,
    exact-integer comment ratio and mean file length
    (stages/extract.py::code_stats)."""
    from ..stages.extract import code_stats

    return code_stats(read_source_files(sf_dir))


def q_assortativity(sf_dir: str):
    """Directed out->in degree assortativity of the entity graph (one
    quantized Pearson over exact degree moments;
    stages/graph.py::degree_assortativity)."""
    from ..stages.graph import degree_assortativity, entity_edges

    return degree_assortativity(_entity_edges(sf_dir))


def q_void_stats(sf_dir: str):
    """VoID dataset statistics (distinct triples, subjects, objects,
    properties, classes, entities) — every metric a distinct census over
    ONE union-tagged exchange on the raw extracted stream
    (stages/graph.py::void_stats)."""
    from ..stages.graph import void_stats

    return void_stats(_extracted(sf_dir))


def q_namespace_census(sf_dir: str):
    """IRI namespace profile (prefix up to the LAST '#' or '/' — the
    reference's pseudo_named_node prefix rule, src/crypto.rs:49-57):
    distinct entities + occurrences per namespace
    (stages/graph.py::namespace_census)."""
    from ..stages.graph import namespace_census

    return namespace_census(_extracted(sf_dir))


def q_property_cardinality(sf_dir: str):
    """Per-(type, predicate) object-cardinality profile: n_subjects,
    sum/min/max objects per subject and the exact-integer mean
    (stages/graph.py::property_cardinality — one subject-hash exchange,
    associative (sum,min,max) fold over the tiny type-predicate domain)."""
    from ..stages.graph import property_cardinality

    return property_cardinality(_extracted(sf_dir))


def q_pmi(sf_dir: str):
    """Predicate co-occurrence PMI over subjects (schema-affinity census):
    quantized floor(1e6*(ln n_pq + ln N - ln n_p - ln n_q)) from exact
    distinct-subject counts (stages/graph.py::predicate_pmi — one
    subject-hash exchange carrying pair, marginal and total partials)."""
    from ..stages.graph import predicate_pmi

    return predicate_pmi(_extracted(sf_dir))


def q_adamic_adar(sf_dir: str):
    """Adamic-Adar link prediction over the entity graph: per candidate
    pair (>=2 shared targets) the quantized hub-down-weighted score
    aa_q = sum floor(1e6/ln(in-degree of shared target))
    (stages/graph.py::adamic_adar_scores — weights computed locally in
    the target-partitioned pair stage, summed as exact int64)."""
    from ..stages.graph import adamic_adar_scores, entity_edges

    return adamic_adar_scores(_entity_edges(sf_dir), min_common=2)


_COAUTHOR_CACHE: dict[str, object] = {}


def _coauthor_edges(sf_dir: str):
    """Memoized, right-sized derived co-author edge set — the shared input
    of the triangle-family queries (q_triangles / q_clustering /
    q_truss_support all re-derive the same CONSTRUCT output; one memoized
    materialize per sf_dir, same rationale as _entity_edges)."""
    ds = _COAUTHOR_CACHE.get(sf_dir)
    if ds is None:
        import pandas as pd

        from .bgp import q_kg_construct

        ds = _rightsized(
            q_kg_construct(sf_dir).map_batches(
                lambda df: df.rename(columns={"s": "a", "o": "b"})[["a", "b"]]
                if len(df)
                else pd.DataFrame(
                    {"a": pd.Series([], dtype=object),
                     "b": pd.Series([], dtype=object)}
                ),
                batch_format="pandas",
            )
        )
        _COAUTHOR_CACHE[sf_dir] = ds
    return ds


def q_triangles(sf_dir: str):
    """Per-node triangle counts over the DERIVED co-author graph (the
    CONSTRUCT output union-ed back in as edges): compact-forward
    degree-orientation plan, each triangle found exactly once
    (stages/graph.py::triangle_counts)."""
    from ..stages.graph import triangle_counts

    return triangle_counts(_coauthor_edges(sf_dir))


def q_clustering(sf_dir: str):
    """Local clustering coefficients over the derived co-author graph:
    exact distinct degrees + compact-forward triangles, cc quantized from
    identical integers in both engines
    (stages/graph.py::clustering_coefficients)."""
    from ..stages.graph import clustering_coefficients

    return clustering_coefficients(_coauthor_edges(sf_dir))


def q_rdfs_domain_range(sf_dir: str):
    """RDFS domain/range inference (rules rdfs2 + rdfs3) composed with the
    subclass closure (rdfs9): per-type distinct-node census after every
    predicate's declared domain types its subjects and its declared range
    types its IRI objects (stages/infer.py::rdfs_domain_range_census).
    Axioms live with the ontology: driver-side, broadcast once."""
    from ..stages.extract import NS
    from ..stages.infer import (
        default_ontology,
        default_property_axioms,
        rdfs_domain_range_census,
    )

    domains, ranges = default_property_axioms(NS)
    return rdfs_domain_range_census(
        _extracted(sf_dir), default_ontology(NS), domains, ranges
    )


def q_truss_support(sf_dir: str):
    """Per-edge triangle support over the derived co-author graph — the
    k-truss peeling quantity (stages/graph.py::edge_supports; triangle
    plan emitting 3 edge keys per triangle, census tree-fold, support-0
    edges kept via the distinct-edge join)."""
    from ..stages.graph import edge_supports

    return edge_supports(_coauthor_edges(sf_dir))


def q_negative_samples(sf_dir: str, *, k: int = 3):
    """Deterministic link-prediction negative samples over the
    file→module import graph (stages/graph.py::negative_samples)."""
    from ..stages.graph import negative_samples

    def imports_only(df):
        import pandas as pd

        m = df["predicate"] == "http://kg.example/ns#imports"
        out = df.loc[m, ["subject", "object_value"]].rename(
            columns={"subject": "a", "object_value": "b"}
        )
        return out.drop_duplicates(ignore_index=True)

    edges = _extracted(sf_dir).map_batches(imports_only, batch_format="pandas")
    return negative_samples(edges, k=k)
