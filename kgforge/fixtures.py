"""Deterministic fixtures (FIXTURES.md F1-F4).

All generation is seeded NumPy — two calls with the same arguments
produce byte-identical tables. The transcript generator records the
*intended* triple per pattern sentence, so the golden triple set is
independent of the extractor implementation (SURVEY.md §5.2): the
extractor must *recover* the intent, it does not define it.

Reference parity: the OpenKE split fixture reproduces the reference's
text interchange layout (``entity2id.txt`` / ``relation2id.txt`` /
``*2id.txt`` with a leading count line, entity ids first and relation
last per triple row) per OpenKEonSpark ``base/Reader.h::importTrainFiles``
(recalled symbol, SURVEY.md §0 — /root/reference is empty).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

SEED = 42
FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

# ---------------------------------------------------------------------------
# F2: gazetteer (entity alias groups) + pattern grammar
# ---------------------------------------------------------------------------

_PEOPLE = [
    "Alice Johnson", "Bob Smith", "Carol White", "David Brown", "Emma Davis",
    "Frank Miller", "Grace Wilson", "Henry Moore", "Irene Taylor", "Jack Anderson",
    "Karen Thomas", "Liam Jackson", "Mona Harris", "Nathan Clark", "Olivia Lewis",
    "Peter Walker", "Quinn Hall", "Rachel Young", "Sam King", "Tina Wright",
]
_ORGS = [
    "Acme Corp", "Globex Inc", "Initech", "Umbrella Labs", "Stark Industries",
    "Wayne Enterprises", "Hooli", "Pied Piper", "Vandelay Industries", "Wonka Factory",
    "Tyrell Corp", "Cyberdyne Systems", "Aperture Science", "Black Mesa", "Oscorp",
    "Massive Dynamic", "Soylent Corp", "Virtucon", "Zorg Industries", "Gringotts Bank",
]
_PLACES = [
    "Springfield", "Gotham City", "Metropolis", "Star City", "Central City",
    "Emerald Town", "Riverdale", "Smallville", "Sunnydale", "Twin Peaks",
    "Hill Valley", "Bedrock", "Quahog", "Langley Falls", "South Park",
    "Pawnee", "Scranton Heights", "Dunder Hills", "Hawkins", "Derry",
]


def _alias_variants(name: str, kind: str) -> list[str]:
    """Deterministic alias group for one canonical entity."""
    aliases = [name]
    if kind == "org":
        # "Acme Corp" -> "ACME CORP", "acme corp.", "Acme Corp."
        aliases.append(name.upper())
        aliases.append(name.lower() + ".")
    elif kind == "person":
        # "Alice Johnson" -> "alice johnson", "Alice  Johnson" is unsafe; use upper.
        aliases.append(name.upper())
    else:  # place
        aliases.append(name.lower())
    return aliases


def gazetteer() -> pd.DataFrame:
    """``surface, canonical, mtype`` rows (~200 surfaces, alias groups)."""
    rows = []
    for name in _PEOPLE:
        for s in _alias_variants(name, "person"):
            rows.append((s, name, "person"))
    for name in _ORGS:
        for s in _alias_variants(name, "org"):
            rows.append((s, name, "org"))
    for name in _PLACES:
        for s in _alias_variants(name, "place"):
            rows.append((s, name, "place"))
    df = pd.DataFrame(rows, columns=["surface", "canonical", "mtype"])
    return df.drop_duplicates(subset=["surface"]).reset_index(drop=True)


@dataclass(frozen=True)
class Pattern:
    pattern_id: int
    pred: str
    active: str           # template with {s} {o}
    passive: str | None   # alternative rendering, same (s, p, o) semantics
    subj_kind: str
    obj_kind: str


PATTERNS: list[Pattern] = [
    Pattern(0, "worksAt", "{s} works at {o}", "{o} employs {s}", "person", "org"),
    Pattern(1, "locatedIn", "{s} is located in {o}", None, "org", "place"),
    Pattern(2, "foundedBy", "{s} was founded by {o}", "{o} founded {s}", "org", "person"),
    Pattern(3, "acquired", "{s} acquired {o}", "{o} was acquired by {s}", "org", "org"),
    Pattern(4, "ceoOf", "{s} is the CEO of {o}", None, "person", "org"),
    Pattern(5, "livesIn", "{s} lives in {o}", None, "person", "place"),
    Pattern(6, "bornIn", "{s} was born in {o}", None, "person", "place"),
    Pattern(7, "partneredWith", "{s} partnered with {o}", None, "org", "org"),
    Pattern(8, "subsidiaryOf", "{s} is a subsidiary of {o}", "{o} owns {s}", "org", "org"),
    Pattern(9, "investedIn", "{s} invested in {o}", None, "org", "org"),
    Pattern(10, "manufactures", "{s} manufactures widgets for {o}", None, "org", "org"),
    Pattern(11, "collaboratesWith", "{s} collaborates with {o}", None, "person", "person"),
]

_NOISE = [
    "The weather has been quite pleasant this week.",
    "Let me think about that for a moment.",
    "That is an interesting question indeed.",
    "The quarterly numbers look promising overall.",
    "We should schedule a follow-up meeting soon.",
    "The report is due by the end of the month.",
    "There were no further updates on that topic.",
    "Thanks, that clarifies things considerably.",
    "Could you elaborate on the previous point?",
    "The system performed within expected parameters.",
]

_PREFIX = ["", "By the way, ", "Note that ", "As discussed, ", "For the record, "]
_SUFFIX = ["", " as reported earlier", " according to the filing", " per the latest memo"]

_TOOLS = ["search", "calc", "lookup", "fetch"]


def patterns_df() -> pd.DataFrame:
    return pd.DataFrame(
        [(p.pattern_id, p.pred, p.active, p.passive or "", p.subj_kind, p.obj_kind) for p in PATTERNS],
        columns=["pattern_id", "pred", "active", "passive", "subj_kind", "obj_kind"],
    )


# ---------------------------------------------------------------------------
# F1: transcripts generator (+ golden triples from generator intent)
# ---------------------------------------------------------------------------

def _surfaces_by_kind(gaz: pd.DataFrame) -> dict[str, pd.DataFrame]:
    return {k: g.reset_index(drop=True) for k, g in gaz.groupby("mtype")}


def gen_transcripts(
    n_convs: int,
    seed: int = SEED,
    hot_frac: float = 0.02,
    median_turns: int = 8,
    hot_factor: int = 40,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    return gen_transcripts_range(0, n_convs, seed, hot_frac, median_turns, hot_factor)


def gen_transcripts_range(
    conv_lo: int,
    conv_hi: int,
    seed: int = SEED,
    hot_frac: float = 0.02,
    median_turns: int = 8,
    hot_factor: int = 40,
    unseen_frac: float = 0.06,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Deterministic transcripts + golden triples + golden mentions.

    Returns ``(transcripts, golden, mentions)``:

    * transcripts: ``conv_id, turn_idx, role, text, tool, ts`` — row order
      globally shuffled (stable re-ordering is actually exercised).
    * golden: ``conv_id, turn_idx, subj, pred, obj, subj_canon, obj_canon``
      — the generator's *intent*, the oracle for the P/R ≥ 0.95 gate.
    * mentions: ``conv_id, turn_idx, surface, start, end, mtype`` — exact
      character spans of every placed surface (generator intent for B2;
      derived arithmetically from values already drawn, so adding it
      changed no byte of transcripts/golden).

    ~``hot_frac`` of conversations are hot keys with ``hot_factor``× the
    median turn count (skew for AQE/salting demos, FIXTURES.md F1).

    ~``unseen_frac`` of surface occurrences are *corrupted alias
    variants* NOT in the gazetteer (space → hyphen, e.g. "Acme-Corp"):
    extraction catches them via a generic hyphen-token capture, and only
    MinHash-LSH + connected-components canonicalization (B7/B8) can link
    them back to their entity — dictionary-only linking provably loses
    that recall (tested).
    """
    gaz = gazetteer()
    by_kind = _surfaces_by_kind(gaz)
    mtype_of = dict(zip(gaz["surface"], gaz["mtype"]))
    base_ts = np.datetime64("2026-01-01T00:00:00", "us")

    t_rows: list[tuple] = []
    g_rows: list[tuple] = []
    m_rows: list[tuple] = []
    for ci in range(conv_lo, conv_hi):
        rng = np.random.default_rng(seed * 1_000_003 + ci)
        conv_id = f"conv{ci:06d}"
        hot = rng.random() < hot_frac
        n_turns = int(rng.integers(max(2, median_turns // 2), median_turns * 2))
        if hot:
            n_turns *= hot_factor
        for ti in range(n_turns):
            u = rng.random()
            if u < 1 / 6:
                role, tool = "tool", _TOOLS[int(rng.integers(len(_TOOLS)))]
            elif u < 0.58:
                role, tool = "assistant", None
            else:
                role, tool = "user", None

            sentences: list[str] = []
            turn_mentions: list[tuple[int, str, int]] = []  # (sent_idx, surface, rel_start)
            if role == "tool":
                sentences.append(f"{tool}() returned {int(rng.integers(1, 9))} results.")
            else:
                n_sent = 2 if rng.random() < 0.2 else 1
                for _ in range(n_sent):
                    if rng.random() < 0.10:
                        sentences.append(_NOISE[int(rng.integers(len(_NOISE)))])
                        continue
                    p = PATTERNS[int(rng.integers(len(PATTERNS)))]
                    skind, okind = by_kind[p.subj_kind], by_kind[p.obj_kind]
                    si = int(rng.integers(len(skind)))
                    oi = int(rng.integers(len(okind)))
                    s_row, o_row = skind.iloc[si], okind.iloc[oi]
                    if s_row["canonical"] == o_row["canonical"]:
                        oi = (oi + 1) % len(okind)
                        o_row = okind.iloc[oi]
                    tmpl = p.active
                    if p.passive and rng.random() < 0.35:
                        tmpl = p.passive

                    def _maybe_corrupt(surface: str) -> str:
                        # unseen alias variant: space -> hyphen (only for
                        # clean multi-word aliases; dotted variants stay)
                        if (
                            unseen_frac > 0
                            and " " in surface
                            and "." not in surface
                            and rng.random() < unseen_frac
                        ):
                            return surface.replace(" ", "-")
                        return surface

                    s_surf = _maybe_corrupt(s_row["surface"])
                    o_surf = _maybe_corrupt(o_row["surface"])
                    body = tmpl.format(s=s_surf, o=o_surf)
                    pre = _PREFIX[int(rng.integers(len(_PREFIX)))]
                    suf = _SUFFIX[int(rng.integers(len(_SUFFIX)))]
                    sentences.append(f"{pre}{body}{suf}.")
                    g_rows.append(
                        (conv_id, ti, s_surf, p.pred, o_surf,
                         s_row["canonical"], o_row["canonical"])
                    )
                    # exact spans of the placed surfaces (generator intent
                    # for B2) — pure arithmetic, no RNG draws
                    si_ = len(sentences) - 1
                    idx_s, idx_o = tmpl.index("{s}"), tmpl.index("{o}")
                    if idx_s < idx_o:
                        s_rel = len(pre) + idx_s
                        o_rel = len(pre) + idx_o - 3 + len(s_surf)
                    else:
                        o_rel = len(pre) + idx_o
                        s_rel = len(pre) + idx_s - 3 + len(o_surf)
                    turn_mentions.append((si_, s_surf, s_rel))
                    turn_mentions.append((si_, o_surf, o_rel))
            ts = base_ts + np.timedelta64(ci * 1440 + ti, "m")
            t_rows.append((conv_id, ti, role, " ".join(sentences), tool, ts))
            if turn_mentions:
                offs = np.concatenate(
                    ([0], np.cumsum([len(s) + 1 for s in sentences[:-1]]))
                ).astype(int)
                for si_, surf, rel in turn_mentions:
                    start = int(offs[si_]) + rel
                    m_rows.append(
                        (conv_id, ti, surf, start, start + len(surf),
                         mtype_of.get(surf, "unknown"))
                    )

    transcripts = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    transcripts["ts"] = transcripts["ts"].astype("datetime64[us]")
    # global shuffle so stable re-ordering is exercised
    perm = np.random.default_rng(seed).permutation(len(transcripts))
    transcripts = transcripts.iloc[perm].reset_index(drop=True)

    golden = pd.DataFrame(
        g_rows,
        columns=["conv_id", "turn_idx", "subj", "pred", "obj", "subj_canon", "obj_canon"],
    ).drop_duplicates().reset_index(drop=True)
    golden["turn_idx"] = golden["turn_idx"].astype("int32")
    mentions = pd.DataFrame(
        m_rows, columns=["conv_id", "turn_idx", "surface", "start", "end", "mtype"]
    ).reset_index(drop=True)
    mentions["turn_idx"] = mentions["turn_idx"].astype("int32")
    mentions["start"] = mentions["start"].astype("int32")
    mentions["end"] = mentions["end"].astype("int32")
    return transcripts, golden, mentions


# ---------------------------------------------------------------------------
# F3: OpenKE-format split fixture (|E|=200, |R|=12, 1500/150/150)
# ---------------------------------------------------------------------------

def gen_openke_split(
    n_ent: int = 200,
    n_rel: int = 12,
    n_train: int = 1500,
    n_valid: int = 150,
    n_test: int = 150,
    seed: int = SEED,
    structured: bool = True,
) -> dict[str, pd.DataFrame]:
    """Seeded KG split in the reference's id space.

    Triples are distinct across splits. With ``structured=True`` (the
    default, used by the committed fixture) the first three relations
    have controlled cardinalities so every 1-1 / 1-N / N-1 / N-N
    category (upstream ``n-n.py`` taxonomy) is represented:

    * r=0 — a sampled permutation pairing (tph = hpt = 1 → 1-1)
    * r=1 — few heads, globally unique tails (1-N)
    * r=2 — symmetric (N-1)
    * r≥3 — uniform random (N-N)
    """
    rng = np.random.default_rng(seed)
    total = n_train + n_valid + n_test
    seen: set[tuple[int, int, int]] = set()
    h_l: list[int] = []
    t_l: list[int] = []
    r_l: list[int] = []

    def _add(h: int, t: int, r: int) -> bool:
        if h == t or (h, t, r) in seen:
            return False
        seen.add((h, t, r))
        h_l.append(h)
        t_l.append(t)
        r_l.append(r)
        return True

    if structured and n_rel >= 4:
        quota = total // n_rel
        # r0: 1-1 — permutation pairing, each head and tail at most once
        perm = rng.permutation(n_ent)
        heads = rng.choice(n_ent, size=min(quota, n_ent), replace=False)
        for h in heads:
            _add(int(h), int(perm[h]), 0)
        # r1: 1-N — small head pool, unique tails
        pool = rng.choice(n_ent, size=max(2, n_ent // 20), replace=False)
        tails = rng.choice(n_ent, size=min(quota, n_ent), replace=False)
        for i, t in enumerate(tails):
            _add(int(pool[i % len(pool)]), int(t), 1)
        # r2: N-1 — symmetric
        pool2 = rng.choice(n_ent, size=max(2, n_ent // 20), replace=False)
        heads2 = rng.choice(n_ent, size=min(quota, n_ent), replace=False)
        for i, h in enumerate(heads2):
            _add(int(h), int(pool2[i % len(pool2)]), 2)
    # fill the remainder (and all of n_rel<4 / structured=False) N-N.
    # Draw from a dense per-relation entity subset so tph/hpt really
    # exceed the 1.5 category threshold (uniform over all entities is
    # too sparse at fixture scale and would classify as 1-1).
    lo_rel = 3 if structured and n_rel >= 4 else 0
    # subset sized so the distinct-triple capacity comfortably covers the
    # remaining quota (a too-small subset cannot supply enough distinct
    # triples and the rejection loop would never terminate)
    needed = total - len(seen)
    per_rel = needed / max(1, n_rel - lo_rel)
    min_sub = int(np.ceil((2.5 * per_rel) ** 0.5)) + 1
    sub = min(n_ent, max(8, n_ent // 4, min_sub)) if structured else n_ent
    subsets = {
        r: rng.choice(n_ent, size=sub, replace=False)
        for r in range(lo_rel, n_rel)
    }
    while len(seen) < total:
        r = int(rng.integers(lo_rel, n_rel))
        ents = subsets[r]
        _add(
            int(ents[rng.integers(len(ents))]),
            int(ents[rng.integers(len(ents))]),
            r,
        )
    # shuffle so the split slices are category-mixed
    order = rng.permutation(total)
    df = (
        pd.DataFrame({"h": h_l, "t": t_l, "r": r_l})
        .iloc[order]
        .reset_index(drop=True)
        .astype("int64")
    )
    ent = pd.DataFrame({"name": [f"ent_{i}" for i in range(n_ent)], "id": np.arange(n_ent, dtype="int64")})
    rel = pd.DataFrame({"name": [p.pred for p in PATTERNS[:n_rel]], "id": np.arange(n_rel, dtype="int64")})
    return {
        "entity2id": ent,
        "relation2id": rel,
        "train2id": df.iloc[:n_train].reset_index(drop=True),
        "valid2id": df.iloc[n_train:n_train + n_valid].reset_index(drop=True),
        "test2id": df.iloc[n_train + n_valid:].reset_index(drop=True),
    }


# ---------------------------------------------------------------------------
# F4: frozen embedding fixture (d=16), per-model extras
# ---------------------------------------------------------------------------

def gen_embeddings(n_ent: int = 200, n_rel: int = 12, dim: int = 16, seed: int = SEED) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def _norm(a: np.ndarray) -> np.ndarray:
        return (a / np.linalg.norm(a, axis=-1, keepdims=True)).astype("float32")

    ent = _norm(rng.normal(size=(n_ent, dim)))
    rel = _norm(rng.normal(size=(n_rel, dim)))
    return {
        "ent": ent,
        "rel": rel,
        # TransH per-relation hyperplane normals
        "norm": _norm(rng.normal(size=(n_rel, dim))),
        # TransR per-relation transfer matrices [|R|, d, d]
        "mat": rng.normal(scale=1.0 / np.sqrt(dim), size=(n_rel, dim, dim)).astype("float32"),
        # TransD entity/relation projection vectors
        "ent_p": _norm(rng.normal(size=(n_ent, dim))),
        "rel_p": _norm(rng.normal(size=(n_rel, dim))),
        # ComplEx imaginary parts (the real parts reuse ent/rel) —
        # drawn AFTER every pre-existing tensor so adding them left all
        # earlier draws (and the committed fixture files) byte-identical
        "ent_im": _norm(rng.normal(size=(n_ent, dim))),
        "rel_im": _norm(rng.normal(size=(n_rel, dim))),
        # RotatE per-relation rotations, stored as the (cos θ, sin θ)
        # pair rather than θ so neither engine computes trig (libm
        # differences would sit exactly at the ulp the oracles round
        # away); unit modulus holds by construction. Drawn after every
        # earlier tensor — same append-only fixture discipline.
        **(lambda th: {"rot_re": np.cos(th), "rot_im": np.sin(th)})(
            rng.uniform(-np.pi, np.pi, size=(n_rel, dim)).astype("float32")
        ),
        # SimplE tail-role entity vectors + inverse-relation vectors
        # (head-role / forward reuse ent/rel). Drawn AFTER every
        # pre-existing tensor — the append-only fixture discipline that
        # keeps all committed fixture files byte-identical.
        "ent_tail": _norm(rng.normal(size=(n_ent, dim))),
        "rel_inv": _norm(rng.normal(size=(n_rel, dim))),
        # Analogy scalar-block vectors (the DistMult half; the complex
        # half reuses ent/rel + ent_im/rel_im). Drawn AFTER every
        # pre-existing tensor — append-only fixture discipline.
        "ent_sc": _norm(rng.normal(size=(n_ent, dim))),
        "rel_sc": _norm(rng.normal(size=(n_rel, dim))),
    }


# ---------------------------------------------------------------------------
# Fixture materialization (parquet on disk, committed for small tags)
# ---------------------------------------------------------------------------

#: tag -> n_convs. sf0.1 and bench are generated on demand (gitignored).
TAG_SIZES = {"unit": 20, "sf0.001": 200, "sf0.01": 2000, "sf0.1": 20000, "bench": 480000}

#: tags whose transcripts are written as a directory of part files by a
#: process pool (parallel generation + splittable scans).
_PARALLEL_TAGS = {"sf0.1": 4, "bench": 32}


def _gen_part(args):
    lo, hi, seed, d = args
    t, g, m = gen_transcripts_range(lo, hi, seed=seed)
    t.to_parquet(os.path.join(d, "transcripts.parquet", f"part-{lo:08d}.parquet"),
                 index=False, row_group_size=32768)
    g.to_parquet(os.path.join(d, "golden_triples.parquet", f"part-{lo:08d}.parquet"),
                 index=False)
    m.to_parquet(os.path.join(d, "golden_mentions.parquet", f"part-{lo:08d}.parquet"),
                 index=False)
    return lo


def fixture_dir(tag: str) -> str:
    return os.path.join(FIXTURE_ROOT, tag)


def ensure_openke_fixture(seed: int = SEED) -> str:
    """Materialize the OpenKE split + frozen embeddings as parquet (and
    the reference text layout) under fixtures/openke/. The embeddings are
    also written in long format ``(id, k, val)`` so DuckDB oracles can
    compute kernel scores relationally."""
    d = os.path.join(FIXTURE_ROOT, "openke")
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    split = gen_openke_split(seed=seed)
    for k, df in split.items():
        df.to_parquet(os.path.join(d, f"{k}.parquet"), index=False)
    from . import io_openke

    io_openke.write_split(split, os.path.join(d, "txt"))
    emb = gen_embeddings(n_ent=len(split["entity2id"]), n_rel=len(split["relation2id"]), seed=seed)

    def _long(mat: "np.ndarray") -> pd.DataFrame:
        n, dim = mat.shape
        return pd.DataFrame(
            {
                "id": np.repeat(np.arange(n, dtype="int64"), dim),
                "k": np.tile(np.arange(dim, dtype="int64"), n),
                "val": mat.astype("float64").ravel(),
            }
        )

    _long(emb["ent"]).to_parquet(os.path.join(d, "ent_emb_long.parquet"), index=False)
    _long(emb["rel"]).to_parquet(os.path.join(d, "rel_emb_long.parquet"), index=False)
    # per-model extras in long format → TransH/R/D kernel scores are
    # relationally computable by the DuckDB oracles
    _long(emb["norm"]).to_parquet(os.path.join(d, "norm_long.parquet"), index=False)
    _long(emb["ent_p"]).to_parquet(os.path.join(d, "entp_long.parquet"), index=False)
    _long(emb["rel_p"]).to_parquet(os.path.join(d, "relp_long.parquet"), index=False)
    # ComplEx imaginary parts (real parts = ent/rel tables above)
    _long(emb["ent_im"]).to_parquet(os.path.join(d, "entim_long.parquet"), index=False)
    _long(emb["rel_im"]).to_parquet(os.path.join(d, "relim_long.parquet"), index=False)
    # RotatE rotation pair (cos θ, sin θ — no trig in either engine)
    _long(emb["rot_re"]).to_parquet(os.path.join(d, "rotre_long.parquet"), index=False)
    _long(emb["rot_im"]).to_parquet(os.path.join(d, "rotim_long.parquet"), index=False)
    # SimplE tail-role / inverse-relation vectors
    _long(emb["ent_tail"]).to_parquet(os.path.join(d, "enttail_long.parquet"), index=False)
    _long(emb["rel_inv"]).to_parquet(os.path.join(d, "relinv_long.parquet"), index=False)
    # Analogy scalar-block vectors (complex block = ent/rel + im tables)
    _long(emb["ent_sc"]).to_parquet(os.path.join(d, "entsc_long.parquet"), index=False)
    _long(emb["rel_sc"]).to_parquet(os.path.join(d, "relsc_long.parquet"), index=False)
    n_r, dim, _ = emb["mat"].shape
    pd.DataFrame(
        {
            "id": np.repeat(np.arange(n_r, dtype="int64"), dim * dim),
            "i": np.tile(np.repeat(np.arange(dim, dtype="int64"), dim), n_r),
            "j": np.tile(np.arange(dim, dtype="int64"), n_r * dim),
            "val": emb["mat"].astype("float64").ravel(),
        }
    ).to_parquet(os.path.join(d, "mat_long.parquet"), index=False)

    # A18 triple-classification sets: positives + one deterministic
    # tail-corrupted negative each (committed so the DuckDB oracle and
    # the engine score the exact same rows)
    n_ent = len(split["entity2id"])
    known = {
        (h, t, r)
        for df in (split["train2id"], split["valid2id"], split["test2id"])
        for h, t, r in df[["h", "t", "r"]].itertuples(index=False)
    }
    rng = np.random.default_rng(seed + 7)
    tc_rows = []
    for name in ("valid2id", "test2id"):
        sp = "valid" if name == "valid2id" else "test"
        for h, t, r in split[name][["h", "t", "r"]].itertuples(index=False):
            tc_rows.append((h, t, r, 1, sp))
            nt = int(rng.integers(n_ent))
            while nt == t or (h, nt, r) in known:
                nt = int(rng.integers(n_ent))
            tc_rows.append((h, nt, r, -1, sp))
    pd.DataFrame(tc_rows, columns=["h", "t", "r", "y", "split"]).astype(
        {"h": "int64", "t": "int64", "r": "int64", "y": "int32"}
    ).to_parquet(os.path.join(d, "tc_sets.parquet"), index=False)
    with open(marker, "w") as f:
        f.write("ok\n")
    return d


def gen_neardup_embeddings(
    n_base: int = 400, n_dup: int = 60, n_mid: int = 20, dim: int = 64, seed: int = SEED
) -> pd.DataFrame:
    """Embedding table with *planted* near-duplicates.

    The driver testdata embeddings are near-random (max pairwise cosine
    ≈ 0.51 at sf0.01), so no high-threshold near-dup structure exists
    there; this fixture plants it: ``n_dup`` perturbed copies at cosine
    ≈ 0.94–0.99 (above a 0.9 near-dup threshold) and ``n_mid``
    distractors at cosine ≈ 0.74–0.86 (below it — the threshold has to
    bite). Base vectors are iid unit normals, pairwise cosine ≪ 0.9.
    Returns ``(vec_id, embedding float32[dim])``.
    """
    rng = np.random.default_rng(seed + 101)

    def _unit(a):
        return a / np.linalg.norm(a, axis=-1, keepdims=True)

    base = _unit(rng.normal(size=(n_base, dim)))
    rows = [base]
    # cos(v, unit(v + e*g)) ≈ 1/sqrt(1+e^2) for unit g ⟂-ish v
    eps_dup = rng.uniform(0.12, 0.33, size=n_dup)
    rows.append(_unit(base[:n_dup] + eps_dup[:, None] * _unit(rng.normal(size=(n_dup, dim)))))
    eps_mid = rng.uniform(0.62, 0.92, size=n_mid)
    rows.append(
        _unit(base[n_dup:n_dup + n_mid] + eps_mid[:, None] * _unit(rng.normal(size=(n_mid, dim))))
    )
    mat = np.vstack(rows).astype("float32")
    return pd.DataFrame(
        {"vec_id": np.arange(len(mat), dtype="int64"), "embedding": list(mat)}
    )


def ensure_neardup_fixture(seed: int = SEED) -> str:
    """Materialize fixtures/neardup/embeddings.parquet (committed — the
    DuckDB oracle reads it by absolute path)."""
    d = os.path.join(FIXTURE_ROOT, "neardup")
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    pdf = gen_neardup_embeddings(seed=seed)
    pdf.to_parquet(os.path.join(d, "embeddings.parquet"), index=False)
    with open(marker, "w") as f:
        f.write("ok\n")
    return d


def _backfill_mentions(d: str, tag: str, seed: int) -> None:
    """Layout upgrade for pre-mentions fixture dirs: golden_mentions was
    added in round 2 with zero new RNG draws, so regenerating it for an
    existing dir reproduces exactly the mentions the committed
    transcripts/golden were built with (they are byte-unchanged)."""
    out = os.path.join(d, "golden_mentions.parquet")
    if os.path.exists(out):
        return
    n_convs = TAG_SIZES[tag]
    if tag in _PARALLEL_TAGS:
        import multiprocessing as mp

        os.makedirs(out, exist_ok=True)
        n_parts = _PARALLEL_TAGS[tag]
        step = (n_convs + n_parts - 1) // n_parts
        jobs = [(lo, min(lo + step, n_convs), seed, d) for lo in range(0, n_convs, step)]
        with mp.Pool(min(n_parts, os.cpu_count() or 8)) as pool:
            pool.map(_gen_mentions_part, jobs)
    else:
        _, _, mentions = gen_transcripts(n_convs, seed=seed)
        mentions.to_parquet(out, index=False)


def _gen_mentions_part(args):
    lo, hi, seed, d = args
    _, _, m = gen_transcripts_range(lo, hi, seed=seed)
    m.to_parquet(
        os.path.join(d, "golden_mentions.parquet", f"part-{lo:08d}.parquet"), index=False
    )
    return lo


def ensure_fixtures(tag: str, seed: int = SEED) -> str:
    """Idempotently materialize the fixture set for ``tag``; returns dir."""
    d = fixture_dir(tag)
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        _backfill_mentions(d, tag, seed)
        return d
    os.makedirs(d, exist_ok=True)
    n_convs = TAG_SIZES[tag]
    if tag in _PARALLEL_TAGS:
        # deterministic under parallelism: each conversation's RNG is
        # seeded by (seed, conv_index) alone, so part boundaries are free
        import multiprocessing as mp

        n_parts = _PARALLEL_TAGS[tag]
        os.makedirs(os.path.join(d, "transcripts.parquet"), exist_ok=True)
        os.makedirs(os.path.join(d, "golden_triples.parquet"), exist_ok=True)
        os.makedirs(os.path.join(d, "golden_mentions.parquet"), exist_ok=True)
        step = (n_convs + n_parts - 1) // n_parts
        jobs = [(lo, min(lo + step, n_convs), seed, d) for lo in range(0, n_convs, step)]
        with mp.Pool(min(n_parts, os.cpu_count() or 8)) as pool:
            pool.map(_gen_part, jobs)
    else:
        transcripts, golden, mentions = gen_transcripts(n_convs, seed=seed)
        transcripts.to_parquet(os.path.join(d, "transcripts.parquet"), index=False,
                               row_group_size=32768)
        golden.to_parquet(os.path.join(d, "golden_triples.parquet"), index=False)
        mentions.to_parquet(os.path.join(d, "golden_mentions.parquet"), index=False)
    gazetteer().to_parquet(os.path.join(d, "gazetteer.parquet"), index=False)
    patterns_df().to_parquet(os.path.join(d, "patterns.parquet"), index=False)
    with open(marker, "w") as f:
        f.write("ok\n")
    return d
