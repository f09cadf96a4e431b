"""Deterministic synthetic ``source_files`` corpus (the KG pipeline input).

BASELINE.json's input_hint mandates a Parquet table
``(repo, path, commit, lang, content)``; no such table exists in
/root/testdata, so we synthesize one *deterministically from the documents
table's doc_id column* — scale follows the scale factor, content is a pure
function of doc_id, and (crucially) the construction is expressible in ANSI
SQL so the DuckDB correctness oracle can rebuild the identical corpus from
the same ``documents`` view.

THE SPEC (single source of truth — the Python and SQL renderings below must
stay in lockstep; tests assert row-for-row equality):

For each ``d = doc_id``::

    A  = d % 11                      -- author id
    L  = ['MIT','Apache-2.0','GPL-3.0'][d % 3]
    M1 = (d * 7 + 3) % 50            -- first imported module
    M2 = (d * 13 + 1) % 50           -- second imported module
    F  = d % 100                     -- function name id
    C  = d % 40                      -- class name id
    lang = 'rs' if d % 13 == 0 else ('js' if d % 7 == 0 else 'py')
    repo = 'org{d % 5}/repo{d % 20}'
    path = 'src/mod_{d}.{lang}'
    commit = sha256('commit:' + repo + ':' + path)[:40]
    hub  = (d % 2 == 0)              -- even rows import the hub module "core"
                                        (Zipf-ish head entity for skew tests)

Language templates embed a license header, author line, two imports, an
optional hub import, one function def with a call edge, and one class def —
so every extractor (imports / defs / calls / repo-author-license facts) has
known, enumerable output. JS quotes modules with a ``.js`` suffix while
py/rs use bare names — deliberate surface-form divergence that the entity
linking stage (normalize → canonical) must reconcile.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..schema import SOURCE_FILES
from . import read_parquet_clean as _read_parquet_clean

LICENSES = ("MIT", "Apache-2.0", "GPL-3.0")

_PY_TMPL = (
    "# Author: author_{A}\n"
    "# License: {L}\n"
    "import mod_{M1}\n"
    "from mod_{M2} import thing\n"
    "{HUB}"
    "def fn_{F}(x):\n"
    "    return mod_{M1}.run(x)\n"
    "class Cls_{C}:\n"
    "    pass\n"
)
_JS_TMPL = (
    "// Author: author_{A}\n"
    "// License: {L}\n"
    "const mod_{M1} = require('mod_{M1}.js');\n"
    "import {{ thing }} from 'mod_{M2}.js';\n"
    "{HUB}"
    "function fn_{F}(x) {{\n"
    "  return mod_{M1}.run(x);\n"
    "}}\n"
    "class Cls_{C} {{}}\n"
)
_RS_TMPL = (
    "// Author: author_{A}\n"
    "// License: {L}\n"
    "use mod_{M1};\n"
    "use mod_{M2}::thing;\n"
    "{HUB}"
    "fn fn_{F}(x: i32) -> i32 {{\n"
    "    mod_{M1}::run(x)\n"
    "}}\n"
    "struct Cls_{C};\n"
)
_HUB = {"py": "import core\n", "js": "const core = require('core.js');\n", "rs": "use core;\n"}
_TMPL = {"py": _PY_TMPL, "js": _JS_TMPL, "rs": _RS_TMPL}


def _lang(d: int) -> str:
    if d % 13 == 0:
        return "rs"
    if d % 7 == 0:
        return "js"
    return "py"


def source_files_batch(doc_ids: np.ndarray) -> pa.Table:
    """Vector-generate the source_files rows for a batch of doc_ids."""
    repo, path, commit, lang, content = [], [], [], [], []
    for d in doc_ids.tolist():
        d = int(d)
        lg = _lang(d)
        rp = f"org{d % 5}/repo{d % 20}"
        pt = f"src/mod_{d}.{lg}"
        cm = hashlib.sha256(f"commit:{rp}:{pt}".encode()).hexdigest()[:40]
        ct = _TMPL[lg].format(
            A=d % 11,
            L=LICENSES[d % 3],
            M1=(d * 7 + 3) % 50,
            M2=(d * 13 + 1) % 50,
            F=d % 100,
            C=d % 40,
            HUB=_HUB[lg] if d % 2 == 0 else "",
        )
        repo.append(rp)
        path.append(pt)
        commit.append(cm)
        lang.append(lg)
        content.append(ct)
    return pa.table(
        {
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "content": pa.array(content, pa.string()),
        },
        schema=SOURCE_FILES,
    )


def read_source_files(sf_dir: str, *, repeat: int = 1, batch_size: int = 2048):
    """documents.parquet(doc_id only — pruned read) → Dataset[SOURCE_FILES].

    The generator is a stateless map_batches task: at 10^12 scale the real
    corpus would be read directly with read_parquet(columns=[...]); this
    stand-in keeps the same streaming shape.

    ``repeat=K`` deterministically amplifies the corpus: doc_id ``d`` expands
    to file ids ``d*K .. d*K+K-1`` (disjoint ranges, same generator) — used
    by the benchmark to scale input volume without external data. The
    correctness oracle always runs with ``repeat=1``.
    """
    import math

    import pyarrow.parquet as pq
    import ray
    import ray.data

    # documents.parquet is a single file → a naive read is ONE block and the
    # whole downstream chain fuses into one task. Size blocks for the
    # POST-amplification row count: each block should expand to ~batch_size
    # files so the fused gen→extract→… chain parallelizes and no task blows
    # up 60× in memory. (Passing a small batch_size to map_batches instead
    # would COALESCE many blocks per task before expanding — the opposite.)
    path = f"{sf_dir}/documents.parquet"
    n_ids = pq.read_metadata(path).num_rows
    cpus = int(ray.cluster_resources().get("CPU", 8))
    num_blocks = max(2 * cpus, math.ceil(n_ids * repeat / batch_size))
    # a single-row-group parquet reads as ONE block no matter what
    # override_num_blocks asks for — repartition the (tiny) id column so the
    # per-block downstream chain actually fans out
    ds = _read_parquet_clean(path, columns=["doc_id"]).repartition(num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if repeat != 1:
            ids = (ids[:, None] * repeat + np.arange(repeat)[None, :]).ravel()
        return source_files_batch(ids)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)


# --- SQL rendering of the same spec (the oracle's input CTE) ---------------

SOURCE_FILES_SQL = """
source_files AS (
  SELECT
    d,
    repo,
    path,
    lang,
    substr(sha256('commit:' || repo || ':' || path), 1, 40) AS commit,
    CASE lang
      WHEN 'py' THEN
        '# Author: author_' || (d % 11) || chr(10) ||
        '# License: ' || lic || chr(10) ||
        'import mod_' || m1 || chr(10) ||
        'from mod_' || m2 || ' import thing' || chr(10) ||
        CASE WHEN d % 2 = 0 THEN 'import core' || chr(10) ELSE '' END ||
        'def fn_' || (d % 100) || '(x):' || chr(10) ||
        '    return mod_' || m1 || '.run(x)' || chr(10) ||
        'class Cls_' || (d % 40) || ':' || chr(10) ||
        '    pass' || chr(10)
      WHEN 'js' THEN
        '// Author: author_' || (d % 11) || chr(10) ||
        '// License: ' || lic || chr(10) ||
        'const mod_' || m1 || ' = require(''mod_' || m1 || '.js'');' || chr(10) ||
        'import { thing } from ''mod_' || m2 || '.js'';' || chr(10) ||
        CASE WHEN d % 2 = 0 THEN 'const core = require(''core.js'');' || chr(10) ELSE '' END ||
        'function fn_' || (d % 100) || '(x) {' || chr(10) ||
        '  return mod_' || m1 || '.run(x);' || chr(10) ||
        '}' || chr(10) ||
        'class Cls_' || (d % 40) || ' {}' || chr(10)
      ELSE
        '// Author: author_' || (d % 11) || chr(10) ||
        '// License: ' || lic || chr(10) ||
        'use mod_' || m1 || ';' || chr(10) ||
        'use mod_' || m2 || '::thing;' || chr(10) ||
        CASE WHEN d % 2 = 0 THEN 'use core;' || chr(10) ELSE '' END ||
        'fn fn_' || (d % 100) || '(x: i32) -> i32 {' || chr(10) ||
        '    mod_' || m1 || '::run(x)' || chr(10) ||
        '}' || chr(10) ||
        'struct Cls_' || (d % 40) || ';' || chr(10)
    END AS content
  FROM (
    SELECT
      d, lang, lic,
      (d * 7 + 3) % 50 AS m1,
      (d * 13 + 1) % 50 AS m2,
      'org' || (d % 5) || '/repo' || (d % 20) AS repo,
      'src/mod_' || d || '.' || lang AS path
    FROM (
      SELECT
        CAST(doc_id AS BIGINT) AS d,
        CASE WHEN doc_id % 13 = 0 THEN 'rs'
             WHEN doc_id % 7 = 0 THEN 'js'
             ELSE 'py' END AS lang,
        CASE doc_id % 3 WHEN 0 THEN 'MIT' WHEN 1 THEN 'Apache-2.0'
             ELSE 'GPL-3.0' END AS lic
      FROM documents
    )
  )
)
""".strip()
