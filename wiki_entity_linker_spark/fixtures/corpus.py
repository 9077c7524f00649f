"""Deterministic synthetic source-code corpus (FIXTURES.md §1-§4).

Pure function of ``(seed, scale)`` — no Spark, no wall clock, no I/O beyond
the parquet sink — so pytest golden outputs are stable. The cluster structure
mirrors the reference's alias families (one entity reachable through
name/alias/family-name/acronym variants, entity_database.py:85-100):

* exact duplicates     — identical ``content`` under different (repo, path);
* near duplicates      — identifier renames / comment edits / whitespace+
                         reorder noise at 3 intensities;
* vendored skew block  — one popular file copied into ~10% of repos
                         (the "popular alias" hot key that exercises salting);
* singletons           — unique files, precision guard;
* adversarial near-miss— same token vocabulary, different logic; must NOT
                         cluster (the demonym/ambiguous-alias analogue,
                         prefix_trie_linker.py:153-159).

Emitted tables: ``source_files(repo,path,commit,lang,content)``,
``gold_clusters(repo,path,commit,entity_id)``,
``labeled_pairs(file_id_a,file_id_b,block_key,is_match)``,
``alias_dict(alias,entity_id,freq)``.
"""

from __future__ import annotations

import hashlib
import os
import random

import pandas as pd

SEED = 42

LANGS = ["py", "java", "c", "js", "go"]

_KEYWORDS = {
    "py": ["def", "return", "if", "else", "for", "in", "import", "class", "pass"],
    "java": ["public", "static", "void", "int", "return", "if", "else", "class", "new"],
    "c": ["int", "return", "if", "else", "for", "void", "struct", "static", "char"],
    "js": ["function", "return", "if", "else", "for", "const", "let", "var", "new"],
    "go": ["func", "return", "if", "else", "for", "var", "type", "struct", "range"],
}

_IDENT_STEMS = [
    "parse", "build", "merge", "split", "hash", "index", "token", "buffer", "stream",
    "node", "edge", "graph", "table", "row", "key", "value", "count", "score", "rank",
    "block", "chunk", "batch", "queue", "stack", "cache", "store", "read", "write",
    "encode", "decode", "filter", "reduce", "map", "fold", "scan", "emit", "flush",
]

_OPS = ["+", "-", "*", "%", "|", "&"]

SCALES = {
    # n_entities drives corpus size; ~5 files/cluster average on dup entities
    "tiny": dict(n_entities=40, n_repos=12, vendored_repo_frac=0.25),
    "small": dict(n_entities=1000, n_repos=50, vendored_repo_frac=0.10),
    "bench": dict(n_entities=40000, n_repos=400, vendored_repo_frac=0.10),
    # 2x bench: enough parallel work that the ~20 s fixed overhead (JIT
    # warmup, job scheduling, CC rounds) stops dominating scaling runs
    "benchxl": dict(n_entities=80000, n_repos=800, vendored_repo_frac=0.10),
    # 4x benchxl (~760k files): after the round-2 pipeline speedups the
    # benchxl job finishes in ~1 min on 8 cores, small enough that fixed
    # overhead swamps the 32-core leg; scaling efficiency is measured here
    "benchxxl": dict(n_entities=320000, n_repos=3200, vendored_repo_frac=0.10),
}


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _commit_of(repo: str, path: str, variant: int) -> str:
    return _sha(f"{repo}:{path}:{variant}")[:40]


def _file_id(repo: str, path: str, commit: str) -> str:
    # mirrors functions.hashing.stable_file_id (sha256 of 'repo|path|commit')
    return _sha(f"{repo}|{path}|{commit}")


def _mk_idents(rng: random.Random, n: int) -> list[str]:
    out = []
    for _ in range(n):
        a, b = rng.choice(_IDENT_STEMS), rng.choice(_IDENT_STEMS)
        out.append(f"{a}_{b}{rng.randrange(10)}")
    return out


def _gen_function(rng: random.Random, lang: str, name: str, idents: list[str],
                  n_lines: int) -> list[str]:
    kw = _KEYWORDS[lang]
    args = rng.sample(idents, k=min(2, len(idents)))
    lines = [f"{kw[0]} {name}({', '.join(args)}):"]
    for _ in range(n_lines):
        a, b, c = rng.choice(idents), rng.choice(idents), rng.choice(idents)
        op = rng.choice(_OPS)
        form = rng.randrange(4)
        if form == 0:
            lines.append(f"    {a} = {b} {op} {c}")
        elif form == 1:
            lines.append(f"    {kw[3]} {a} {op} {b}:")
            lines.append(f"        {c} = {a}")
        elif form == 2:
            lines.append(f"    {a} = {name}_{b}({c})")
        else:
            lines.append(f"    {kw[1]} {a} {op} {c}")
    return lines


def _gen_base_content(rng: random.Random, lang: str, main_name: str,
                      idents: list[str], n_funcs: int) -> str:
    blocks = []
    names = [main_name] + [f"{main_name}_{i}" for i in range(1, n_funcs)]
    for nm in names:
        blocks.append("\n".join(_gen_function(rng, lang, nm, idents, rng.randint(4, 16))))
    header = f"# module {main_name} generated fixture\n"
    return header + "\n\n".join(blocks) + "\n"


def _rename_variant(rng: random.Random, content: str, idents: list[str]) -> str:
    """Intensity-1 near dup: consistent identifier rename of a few idents."""
    out = content
    for ident in rng.sample(idents, k=max(1, len(idents) // 4)):
        out = out.replace(ident, ident + "_v2")
    return out


def _comment_variant(rng: random.Random, content: str) -> str:
    """Intensity-2 near dup: comment insertion/edit on a few lines."""
    lines = content.split("\n")
    for _ in range(max(1, len(lines) // 12)):
        i = rng.randrange(len(lines))
        lines[i] = lines[i] + f"  # note {rng.randrange(100)}"
    return "\n".join(lines)


def _whitespace_reorder_variant(rng: random.Random, content: str) -> str:
    """Intensity-3 near dup: blank-line noise + swap two function blocks."""
    blocks = content.split("\n\n")
    if len(blocks) > 2:
        i, j = 1, len(blocks) - 1
        blocks[i], blocks[j] = blocks[j], blocks[i]
    out = "\n\n".join(blocks)
    lines = out.split("\n")
    ins = sorted(rng.sample(range(len(lines)), k=min(3, len(lines))), reverse=True)
    for i in ins:
        lines.insert(i, "")
    return "\n".join(lines)


def _adversarial_of(rng: random.Random, lang: str, main_name: str,
                    idents: list[str]) -> str:
    """Same token vocabulary, different structure — must not cluster."""
    shuffled = idents[:]
    rng.shuffle(shuffled)
    # different function names but same identifier vocabulary and lang keywords
    return _gen_base_content(rng, lang, main_name, shuffled,
                             n_funcs=rng.randint(2, 4))


def generate_corpus(scale: str = "small", seed: int = SEED) -> dict[str, pd.DataFrame]:
    cfg = SCALES[scale]
    n_entities = cfg["n_entities"]
    n_repos = cfg["n_repos"]
    repos = [f"org{i % 20}/proj{i}" for i in range(n_repos)]

    files: list[tuple[str, str, str, str, str]] = []   # repo,path,commit,lang,content
    gold: list[tuple[str, str, str, str]] = []          # +entity_id
    alias_rows: list[tuple[str, str, int]] = []         # alias,entity_id,freq
    pair_rows: list[tuple[str, str, str, bool]] = []    # a,b,block_key,is_match

    def add_file(repo: str, path: str, variant: int, lang: str, content: str,
                 entity_id: str) -> str:
        commit = _commit_of(repo, path, variant)
        files.append((repo, path, commit, lang, content))
        gold.append((repo, path, commit, entity_id))
        return _file_id(repo, path, commit)

    # --- vendored skew entity: one popular file copied into ~10% of repos ---
    rng = random.Random(f"{seed}-vendored")
    v_lang = "c"
    v_idents = _mk_idents(rng, 12)
    v_name = "vendor_json_core"
    v_content = _gen_base_content(rng, v_lang, v_name, v_idents, 5)
    v_eid = "E_vendored"
    n_vendor = max(2, int(n_repos * cfg["vendored_repo_frac"]))
    vendor_ids = []
    for r in repos[:n_vendor]:
        fid = add_file(r, f"vendor/lib/{v_name}.c", 0, v_lang, v_content, v_eid)
        vendor_ids.append(fid)
    alias_rows.append((v_name, v_eid, n_vendor))
    # labeled pairs: sample of vendored intra-cluster pairs (quadratic cap)
    vp = random.Random(f"{seed}-vendored-pairs")
    for _ in range(min(50, n_vendor * 2)):
        a, b = vp.sample(vendor_ids, 2)
        lo, hi = min(a, b), max(a, b)
        pair_rows.append((lo, hi, v_name, True))

    # --- regular entities ---
    for e in range(n_entities):
        rng = random.Random(f"{seed}-entity-{e}")
        eid = f"E{e}"
        lang = rng.choice(LANGS)
        idents = _mk_idents(rng, rng.randint(6, 14))
        main_name = f"{rng.choice(_IDENT_STEMS)}_{rng.choice(_IDENT_STEMS)}_{e}"
        base = _gen_base_content(rng, lang, main_name, idents, rng.randint(2, 6))
        repo = repos[rng.randrange(n_repos)]
        stem = main_name.replace("_", "-")
        path = f"src/{rng.choice(['core','util','io','net'])}/{stem}.{lang}"
        member_ids = [add_file(repo, path, 0, lang, base, eid)]

        kind = e % 10  # deterministic mix of cluster shapes
        if kind < 3:
            # singleton: no variants
            pass
        elif kind < 5:
            # exact duplicates in 1-2 other repos (cluster via sha256 alone)
            for d in range(1, rng.randint(2, 3)):
                r2 = repos[(repos.index(repo) + d * 7 + 1) % n_repos]
                member_ids.append(
                    add_file(r2, f"copy/{stem}.{lang}", d, lang, base, eid))
        else:
            # near duplicates at up to 3 edit intensities
            variants = []
            variants.append(_rename_variant(rng, base, idents))
            if kind >= 7:
                variants.append(_comment_variant(rng, base))
            if kind >= 9:
                variants.append(_whitespace_reorder_variant(rng, base))
            for d, vcontent in enumerate(variants, start=1):
                r2 = repos[(repos.index(repo) + d * 11 + 3) % n_repos]
                member_ids.append(
                    add_file(r2, f"fork/{stem}.{lang}", d, lang, vcontent, eid))

        alias_rows.append((main_name, eid, len(member_ids)))
        # positive labeled pairs: all intra-cluster pairs at the alias block key
        for i in range(len(member_ids)):
            for j in range(i + 1, len(member_ids)):
                a, b = member_ids[i], member_ids[j]
                lo, hi = min(a, b), max(a, b)
                pair_rows.append((lo, hi, main_name, True))

        # adversarial near-miss sharing the alias block (every 6th entity)
        if e % 6 == 0:
            adv_eid = f"E{e}_adv"
            adv = _adversarial_of(rng, lang, main_name, idents)
            r3 = repos[(repos.index(repo) + 5) % n_repos]
            adv_id = add_file(r3, f"src/alt/{stem}-alt.{lang}", 9, lang, adv, adv_eid)
            alias_rows.append((main_name, adv_eid, 1))  # ambiguous alias (2 entities)
            for mid in member_ids[: min(3, len(member_ids))]:
                lo, hi = min(adv_id, mid), max(adv_id, mid)
                pair_rows.append((lo, hi, main_name, False))  # hard negative

    # deliberately-tied aliases for the argmax-with-ties semantics test
    alias_rows.append(("shared_helper", "E0", 7))
    alias_rows.append(("shared_helper", "E1", 7))
    alias_rows.append(("shared_helper", "E2", 3))

    source_files = pd.DataFrame(
        files, columns=["repo", "path", "commit", "lang", "content"])
    gold_clusters = pd.DataFrame(
        gold, columns=["repo", "path", "commit", "entity_id"])
    labeled_pairs = pd.DataFrame(
        pair_rows, columns=["file_id_a", "file_id_b", "block_key", "is_match"]
    ).drop_duplicates(subset=["file_id_a", "file_id_b"]).reset_index(drop=True)
    alias_dict = pd.DataFrame(alias_rows, columns=["alias", "entity_id", "freq"])
    return {
        "source_files": source_files,
        "gold_clusters": gold_clusters,
        "labeled_pairs": labeled_pairs,
        "alias_dict": alias_dict,
    }


def ensure_corpus(out_dir: str, scale: str = "small", seed: int = SEED) -> str:
    """Write the corpus parquet tables under ``out_dir/<scale>`` (idempotent —
    the reference's skip-if-output-exists Make pattern, Makefile:178-198)."""
    d = os.path.join(out_dir, scale)
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    tables = generate_corpus(scale, seed)
    for name, df in tables.items():
        df.to_parquet(os.path.join(d, f"{name}.parquet"), index=False)
    with open(marker, "w") as f:
        f.write(f"scale={scale} seed={seed} files={len(tables['source_files'])}\n")
    return d
