"""Deterministic synthetic transcript corpus + ground-truth labels (FIXTURES.md).

Generates the graft's primary input: a table of multi-turn conversation
transcripts ``(conv_id, turn_idx, role, text, tool, ts)`` where each
conversation describes exactly one entity, plus a ``labels`` table of
ground-truth match pairs with the blocking key each pair must co-occur under.

All randomness is ``numpy.random.default_rng(seed + family_index)`` — fully
deterministic, no external data (BASELINE.json input_hint).

Expected-decision engineering (pinned by tests; arithmetic traced from
/root/reference engine/ConfidenceScorer.java:18-75 with quirk Q1 defaults):

- ``expected='match'`` families share MEI+LEI+EIN, so pairs score
  40 (mei_match) + 20 (lei_boost) + 15 (ein_boost) + 10 (multi-identifier)
  + 10 (geo) + 5 (email .com/US geo) - 5 (duplicate penalty) = 95 -> MATCH.
- ``expected='review'`` families (P10) share only EIN (+ email domain with a
  name-root match): 30 + 20 + 10 - 5 = 55 -> MANUAL_REVIEW (>=50, <85).
- CHAIN families produce A-B and B-C MATCH edges but no A-C blocking
  co-occurrence — the transitive-closure test for connected components.
- Hard negatives (~2x positives) share a name-token blocking key but top out
  well below 85 even with the Q1 discrepancy-bonus quirk.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field, replace

import numpy as np
import pandas as pd

from ..functions.lookups import FUND_MANAGER_ALIASES

# Deterministic word lists (FIXTURES.md §1.1). Generated from syllable pools —
# no external data, stable across runs.
_ADJ_A = ["qui", "bri", "sil", "nor", "blu", "iro", "amb", "nob", "rap", "sto",
          "gra", "vel", "cry", "mar", "fal", "haw", "cin", "dus", "emb", "fro"]
_ADJ_B = ["et", "ght", "ver", "th", "e", "n", "er", "le", "id", "ne"]
ADJECTIVES = [a + b for a, b in itertools.product(_ADJ_A, _ADJ_B)]  # 200

_NOUN_A = ["riv", "lak", "pin", "oak", "fiel", "ridg", "harb", "summ", "vall", "glen",
           "bay", "cliff", "moor", "fen", "dal", "wold", "heath", "marsh", "holt", "comb"]
# NOTE: suffixes must not form ServiceProviderDetector keyword substrings
# ('and', 'law', 'tax', ...) or the entity's own domain gets filtered (F2).
_NOUN_B = ["er", "eside", "ewood", "emoor", "dstone", "eline", "orview", "itgate", "eybrook", "haven"]
NOUNS = [a + b for a, b in itertools.product(_NOUN_A, _NOUN_B)]  # 200

# Display corporate forms with swap groups for P2 (NameNormalizer.java:20-36 set)
FORM_VARIANTS = [
    ["Inc.", "Incorporated", ""],
    ["LLC", "L.L.C.", ""],
    ["Ltd.", "Limited", ""],
    ["PLC", "Public Limited Company", "PLC"],
    ["Corp.", "Corporation", ""],
    ["GmbH", "GmbH", ""],
    ["Holdings", "Holding", ""],
]

_FM_CANONICALS = list(FUND_MANAGER_ALIASES.values())
_FM_KEYS = list(FUND_MANAGER_ALIASES.keys())

_MEI_COUNTRIES = ["US", "GB", "DE", "FR", "JP", "CA", "CH", "NL", "IE", "LU"]

_FIRSTS = ["alice", "bob", "carol", "dan", "erin", "frank", "grace", "hugo"]
_LASTS = ["stone", "reed", "park", "lane", "wells", "cross", "bond", "hale"]

_SP_DOMAINS = ["gmail.com", "pwc.com", "citco.com", "kirkland.com"]

MATCH_CLASSES = ["P1", "P2", "P3", "P4", "P5", "P6", "P7", "P8", "P9", "P11"]


@dataclass
class Entity:
    """One rendered entity description (the per-conversation ground truth)."""
    legal_name: str
    fund_manager: str | None
    mei: str | None
    lei: str | None
    ein: str | None          # rendered (may lack hyphen)
    dd: str | None
    domain: str
    country_render: str      # as written in the transcript
    country_code: str        # ISO truth
    dba_line: str | None = None
    has_tax: bool = False
    ocr_noise: bool = False
    sp_email: bool = False


def _mk_identifiers(rng) -> tuple[str, str, str, str]:
    cc = _MEI_COUNTRIES[int(rng.integers(len(_MEI_COUNTRIES)))]
    # force a '0' digit so P5 can render it as 'O' and still converge under D2
    digits = "".join(str(int(d)) for d in rng.integers(0, 10, 7))
    mei = f"{cc}0{digits}"
    lei = "".join(rng.choice(list("ABCDEFGHJKLMNPQRSTUVWXYZ0123456789"), 20))
    ein = f"{int(rng.integers(10, 99)):02d}-{int(rng.integers(1000000, 9999999)):07d}"
    dd = "".join(rng.choice(list("ABCDEFGH0123456789"), 8))
    return mei, lei, ein, dd


def _base_entity(rng, fam_idx: int, klass: str) -> Entity:
    adj = ADJECTIVES[fam_idx % len(ADJECTIVES)].capitalize()
    noun = NOUNS[(fam_idx * 7 + 3) % len(NOUNS)].capitalize()
    group = FORM_VARIANTS[fam_idx % len(FORM_VARIANTS)]
    form = group[0]
    mei, lei, ein, dd = _mk_identifiers(rng)
    cc = mei[:2]
    if klass == "P3":
        legal = f"{adj} International {noun} {form}".strip()
    elif klass == "P10":
        # single-token root so the email domain-root +20 boost fires
        legal = f"{adj}{noun} Capital LLC"
    else:
        legal = f"{adj} {noun} {form}".strip()
    fm = None
    if fam_idx % 5 != 0:  # ~80% managed funds
        fm = _FM_CANONICALS[fam_idx % len(_FM_CANONICALS)].title()
    domain = f"{adj.lower()}{noun.lower()}.com" if klass != "P10" else f"{adj.lower()}{noun.lower()}.com"
    if klass == "P10":
        domain = f"{(adj + noun).lower()}.com"
    country_render = cc if fam_idx % 2 else {"US": "USA", "GB": "UK"}.get(cc, cc)
    return Entity(
        legal_name=legal, fund_manager=fm, mei=mei, lei=lei, ein=ein, dd=dd,
        domain=domain, country_render=country_render, country_code=cc,
        has_tax=(fam_idx % 2 == 0),
    )


def _perturb(base: Entity, klass: str, rng) -> Entity:
    e = replace(base)
    if klass == "P1":
        e.legal_name = base.legal_name.replace(" ", " Group ", 1)
    elif klass == "P2":
        for group in FORM_VARIANTS:
            if base.legal_name.endswith(" " + group[0]):
                e.legal_name = (base.legal_name[: -len(group[0])] + group[1]).strip()
                break
    elif klass == "P3":
        e.legal_name = base.legal_name.replace("International", "Intl")
    elif klass == "P4":
        # diacritic + smart punctuation; D1 folds both back (tests P4)
        e.legal_name = base.legal_name.replace("e", "é", 1).replace(".", "․", 1)
    elif klass == "P5":
        e.ocr_noise = True
    elif klass == "P6":
        parts = base.legal_name.split()
        e.legal_name = " ".join(parts[::-1])
    elif klass == "P7":
        parts = base.legal_name.split()
        e.legal_name = " ".join(parts[:1] + ["Global"] + parts[1:])
    elif klass == "P8":
        if base.fund_manager:
            norm = base.fund_manager.lower()
            for k, v in FUND_MANAGER_ALIASES.items():
                if v == norm:
                    e.fund_manager = k.upper()
                    break
    elif klass == "P9":
        e.dba_line = f"DBA: {base.legal_name.split()[0]} Trading"
    elif klass == "P10":
        e.mei = None
        e.lei = None
        e.dd = None
        e.ein = base.ein.replace("-", "") if base.ein else None  # hyphen varied
        e.legal_name = base.legal_name + " Fund"
    elif klass == "P11":
        parts = base.legal_name.split()
        e.legal_name = "-".join(parts[:2]) + " " + " ".join(parts[2:])
    return e


def _render_turns(conv_id: str, ent: Entity, conv_seed: int, rng) -> list[dict]:
    """FIXTURES.md §1.1 turn template; field lines spread across turns."""
    lines1 = [f"Legal Name: {ent.legal_name}"]
    if ent.fund_manager:
        lines1.append(f"Fund Manager: {ent.fund_manager}")
    id_lines = []
    if ent.mei:
        mei = ent.mei
        if ent.ocr_noise:
            mei = mei[:2] + mei[2:].replace("0", "O", 1)
        id_lines.append(f"MEI: {mei}")
    if ent.lei:
        id_lines.append(f"LEI: {ent.lei}")
    if ent.ein:
        id_lines.append(f"EIN: {ent.ein}")
    if ent.dd:
        id_lines.append(f"Debt Domain ID: {ent.dd}")
    f1, l1 = _FIRSTS[conv_seed % len(_FIRSTS)], _LASTS[conv_seed % len(_LASTS)]
    f2, l2 = _FIRSTS[(conv_seed + 3) % len(_FIRSTS)], _LASTS[(conv_seed + 5) % len(_LASTS)]
    emails = [f"{f1}.{l1}@{ent.domain}", f"{f2}.{l2}@{ent.domain}"]
    if ent.sp_email:
        emails.append(f"legal@{_SP_DOMAINS[conv_seed % len(_SP_DOMAINS)]}")
    contact = f"Contacts: {', '.join(emails)}\nCountry: {ent.country_render}"

    turns = [
        ("user", None, "We need to onboard a new lender for the deal."),
        ("assistant", None, "\n".join(lines1)),
        ("tool", "lookup_mei", "\n".join(id_lines) if id_lines else "no identifiers on file"),
        ("assistant", None, contact),
    ]
    if ent.dba_line:
        turns.append(("assistant", None, ent.dba_line))
    if ent.has_tax:
        tax = [f"Tax Form W-9", f"Entity Name: {ent.legal_name}"]
        if ent.ein:
            tax.append(f"TIN: {ent.ein}")
        tax.append(f"Country: {ent.country_render}")
        turns.append(("tool", "fetch_taxform", "\n".join(tax)))
    turns.append(("assistant", None, "Summary recorded for onboarding."))

    base_ts = np.datetime64("2026-01-01T00:00:00") + np.timedelta64(
        (conv_seed % 10_000) * 3600, "s"
    )
    rows = []
    for idx, (role, tool, text) in enumerate(turns):
        rows.append({
            "conv_id": conv_id,
            "turn_idx": np.int32(idx),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": base_ts + np.timedelta64(idx * 7, "s"),
        })
    return rows


def _family_layout(fam_idx: int) -> tuple[str, int]:
    """(class, n_duplicates) cycling deterministically; k in {0..3}."""
    klass = MATCH_CLASSES[fam_idx % len(MATCH_CLASSES)]
    k = (fam_idx % 4)  # 0..3 duplicates
    return klass, k


def generate_corpus(n_families: int = 400, seed: int = 42,
                    chain_families: int = 8, p10_families: int = 12,
                    negatives_per_positive: float = 2.0):
    """Build (transcripts, labels) pandas DataFrames.

    transcripts: (conv_id, turn_idx, role, text, tool, ts) — rows shuffled so
    assembly must sort by turn_idx (FIXTURES.md §1).
    labels: (conv_id_a, conv_id_b, is_match, block_key, perturbation, expected)
    with expected in {'match','review','negative'}.
    """
    rows: list[dict] = []
    labels: list[dict] = []
    conv_counter = 0

    def next_conv():
        nonlocal conv_counter
        cid = f"conv{conv_counter:08d}"
        conv_counter += 1
        return cid

    def emit(ent: Entity, fam_seed: int, rng):
        cid = next_conv()
        rows.extend(_render_turns(cid, ent, fam_seed, rng))
        return cid

    n_positive_pairs = 0

    # --- match families -------------------------------------------------
    for fam in range(n_families):
        rng = np.random.default_rng(seed + fam)
        klass, k = _family_layout(fam)
        base = _base_entity(rng, fam, klass)
        cids = [emit(base, fam, rng)]
        for d in range(k):
            dup = _perturb(base, klass, rng)
            cids.append(emit(dup, fam * 31 + d + 1, rng))
        for a, b in itertools.combinations(cids, 2):
            labels.append({
                "conv_id_a": min(a, b), "conv_id_b": max(a, b),
                "is_match": True,
                "block_key": f"mei:{base.mei}",
                "perturbation": klass,
                "expected": "match",
            })
            n_positive_pairs += 1

    # --- P10 (review-expected: EIN + email only) ------------------------
    for j in range(p10_families):
        fam = n_families + j
        rng = np.random.default_rng(seed + 10_000 + j)
        base = _base_entity(rng, fam, "P10")
        dup = _perturb(base, "P10", rng)
        a = emit(base, fam, rng)
        b = emit(dup, fam * 31 + 1, rng)
        labels.append({
            "conv_id_a": min(a, b), "conv_id_b": max(a, b),
            "is_match": True,
            "block_key": f"ein:{(base.ein or '').replace('-', '')}",
            "perturbation": "P10",
            "expected": "review",
        })

    # --- chain families (A-B via MEI set, B-C via LEI/EIN/DD set) -------
    for j in range(chain_families):
        fam = n_families + p10_families + j
        rng = np.random.default_rng(seed + 20_000 + j)
        base = _base_entity(rng, fam, "P1")
        mei1, lei1, ein1, dd1 = base.mei, base.lei, base.ein, base.dd
        _, lei2, ein2, dd2 = _mk_identifiers(rng)
        ea = replace(base, lei=lei1, ein=ein1, dd=None, has_tax=True)
        eb = replace(base, legal_name=base.legal_name.replace(" ", " Group ", 1),
                     lei=lei2, ein=ein2, dd=dd2, has_tax=True)
        ec = replace(base, mei=None, legal_name=" ".join(base.legal_name.split()[::-1]),
                     lei=lei2, ein=ein2, dd=dd2, has_tax=True)
        a = emit(ea, fam, rng)
        b = emit(eb, fam * 31 + 1, rng)
        c = emit(ec, fam * 31 + 2, rng)
        labels.append({"conv_id_a": a, "conv_id_b": b, "is_match": True,
                       "block_key": f"mei:{mei1}", "perturbation": "CHAIN-AB",
                       "expected": "match"})
        labels.append({"conv_id_a": b, "conv_id_b": c, "is_match": True,
                       "block_key": f"lei:{lei2}", "perturbation": "CHAIN-BC",
                       "expected": "match"})
        labels.append({"conv_id_a": a, "conv_id_b": c, "is_match": True,
                       "block_key": None, "perturbation": "CHAIN-AC-transitive",
                       "expected": "transitive"})
        n_positive_pairs += 2

    # --- hard negatives --------------------------------------------------
    n_negatives = int(n_positive_pairs * negatives_per_positive)
    neg_kinds = ["same_fm", "shared_tokens", "same_country_form", "id_digit_off"]
    for j in range(n_negatives):
        rng = np.random.default_rng(seed + 50_000 + j)
        kind = neg_kinds[j % len(neg_kinds)]
        fam = 100_000 + j
        e1 = _base_entity(rng, fam, "P1")
        # sparse identifiers for negatives: MEI only, distinct values
        e1 = replace(e1, lei=None, dd=None, ein=None, has_tax=False)
        adj = e1.legal_name.split()[0]
        mei2 = e1.mei[:2] + str((int(e1.mei[2]) + 1) % 10) + e1.mei[3:]
        if kind == "same_fm":
            e2 = replace(e1, legal_name=f"{adj} Meadowline Inc.", mei=mei2,
                         domain="meadowline-" + e1.domain)
        elif kind == "shared_tokens":
            noun = e1.legal_name.split()[1]
            e2 = replace(e1, legal_name=f"{adj} {noun} Partners", mei=mei2,
                         fund_manager=None, domain="pt-" + e1.domain)
        elif kind == "same_country_form":
            e2 = replace(e1, legal_name=f"{adj} Stonebridge Ltd.", mei=mei2,
                         fund_manager=None, domain="sb-" + e1.domain)
        else:  # id_digit_off — same name tokens, near-miss identifier
            e2 = replace(e1, legal_name=f"{adj} Kestrel LLC", mei=mei2,
                         domain="ke-" + e1.domain)
        a = emit(e1, fam, rng)
        b = emit(e2, fam * 31 + 1, rng)
        adj_tok = adj.lower()
        labels.append({
            "conv_id_a": min(a, b), "conv_id_b": max(a, b),
            "is_match": False,
            "block_key": f"nametok:{adj_tok}",
            "perturbation": f"NEG-{kind}",
            "expected": "negative",
        })

    transcripts = pd.DataFrame(rows)
    transcripts["ts"] = pd.to_datetime(transcripts["ts"])
    # shuffled row order (assembly must sort) — deterministic permutation
    perm = np.random.default_rng(seed).permutation(len(transcripts))
    transcripts = transcripts.iloc[perm].reset_index(drop=True)
    labels_df = pd.DataFrame(labels)
    return transcripts, labels_df


TRANSCRIPT_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def transcripts_to_spark(spark, transcripts: pd.DataFrame):
    """Create the Spark transcripts DataFrame with the BASELINE.json schema."""
    return spark.createDataFrame(transcripts, schema=TRANSCRIPT_SCHEMA_DDL)
