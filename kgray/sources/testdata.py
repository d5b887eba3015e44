"""Deterministic closed-world transcript generator (FIXTURES.md §1).

Produces the primary input table
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` with:

- templated factual sentences over a closed world whose expected quintuples
  are computable (modeled on the reference unit-test timeline,
  tests/atom/test_atom_matching.py:192-215, and the few-shot prompts,
  itext2kg/atom/models/prompts.py:5-43);
- surface-form variants of entities ("John Doe"/"J. Doe", "Google"/"Google
  Inc") and predicate phrasings ("works at"/"is employed at") to exercise
  embedding-based matching at the reference thresholds;
- end-validity facts ("no longer ... on D") → affirmative predicate with only
  t_end (README.md:94-98);
- unparseable date strings (skipped-silently path, atom/atom.py:124-133);
- distractor turns and empty tool turns;
- ``turn_idx`` written SHUFFLED within the file so pipelines must restore
  order with groupby + sort.

Everything is seeded — same (seed, n_conversations) → byte-identical table.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from kgray.functions.normalize import normalize_name_py, normalize_predicate_py

_FIRST = ["John", "Alice", "Robert", "Emma", "Wei", "Fatima", "Carlos", "Yuki",
          "Olga", "David", "Sara", "Liam", "Nora", "Pierre", "Aisha", "Tom"]
_LAST = ["Doe", "Smith", "Chen", "Garcia", "Khan", "Tanaka", "Petrova",
         "Brown", "Dubois", "Okafor", "Nguyen", "Rossi"]
_ORGS = ["Google", "Amazon", "Mirantis", "Datadog", "Airbus", "Siemens",
         "Shopify", "Stripe", "Zalando", "Spotify", "Nokia", "Toyota"]
_CITIES = ["Paris", "Berlin", "Tokyo", "Lyon", "Austin", "Toronto", "Oslo",
           "Madrid", "Seoul", "Lagos"]
_POSITIONS = ["engineer", "researcher", "designer", "manager", "analyst",
              "scientist"]
_LANGS = ["Python", "Rust", "Go", "Scala"]
_ANIMALS = ["falcon", "otter", "python", "lynx"]
_DISTRACTORS = [
    "The weather is nice today.",
    "Let me check that for you.",
    "Thanks, that answers my question.",
    "Could you elaborate on the previous point?",
    "Searching the knowledge base now.",
]

# predicate phrasings: (sentence template fragment, emitted predicate surface)
_WORK_PHRASES = [("is a {pos} at", "works at"), ("is employed as a {pos} at", "is employed at")]
_CEO_PHRASES = [("is the CEO of", "is ceo of"), ("serves as chief executive of", "ceo of")]
_ACQ_PHRASES = [("acquired", "acquired"), ("bought", "bought")]
_LIVE_PHRASES = [("lives in", "lives in"), ("resides in", "resides in")]

# concept keys for predicate canonicalization (all phrasings of one concept
# embed near one base vector)
_PRED_CONCEPTS = {
    "works at": "pred:works_at", "is employed at": "pred:works_at",
    "is ceo of": "pred:is_ceo_of", "ceo of": "pred:is_ceo_of",
    "acquired": "pred:acquires", "bought": "pred:acquires",
    "lives in": "pred:lives_in", "resides in": "pred:lives_in",
    "codes in": "pred:codes_in",
    "studies": "pred:studies",
}


_norm = normalize_name_py


@dataclass
class World:
    """Closed world: concepts, their surface variants, and a fact pool."""

    seed: int
    n_persons: int
    n_orgs: int
    # concept table in normalized-surface space → concept key
    concepts: dict[str, str] = field(default_factory=dict)
    person_surfaces: list[list[str]] = field(default_factory=list)
    org_surfaces: list[list[str]] = field(default_factory=list)
    # facts: (kind, subj_concept_idx, obj_concept_idx_or_value, extras)
    facts: list[tuple] = field(default_factory=list)

    def surface_to_concept(self) -> dict[str, str]:
        return dict(self.concepts)


def _person_variants(first: str, last: str) -> list[str]:
    full = f"{first} {last}"
    return [full, f"{first[0]}. {last}", full.upper()]


def _org_variants(org: str) -> list[str]:
    return [org, f"{org} Inc", f"{org.upper()}"]


def build_world(seed: int, n_persons: int = 24, n_orgs: int = 10) -> World:
    rng = np.random.default_rng(seed)
    w = World(seed=seed, n_persons=n_persons, n_orgs=n_orgs)

    pairs = [(f, l) for f in _FIRST for l in _LAST]
    idx = rng.permutation(len(pairs))
    for k in range(n_persons):
        first, last = pairs[idx[k % len(pairs)]]
        if k >= len(pairs):  # beyond the name pool: numbered generations
            last = f"{last} {k // len(pairs) + 1}"
        variants = _person_variants(first, last)
        w.person_surfaces.append(variants)
        for v in variants:
            w.concepts[_norm(v)] = f"person:{k}"
    for k in range(n_orgs):
        org = _ORGS[k % len(_ORGS)]
        if k >= len(_ORGS):
            org = f"{org} {k // len(_ORGS) + 1}"
        variants = _org_variants(org)
        w.org_surfaces.append(variants)
        for v in variants:
            w.concepts[_norm(v)] = f"org:{k}"
    for c in _CITIES:
        w.concepts[_norm(c)] = f"city:{c.lower()}"
    for c in _LANGS:
        w.concepts[_norm(c)] = f"lang:{c.lower()}"
    for c in _ANIMALS:
        w.concepts[_norm(c)] = f"animal:{c.lower()}"
    # predicates are normalized with the label/predicate regex before
    # embedding (relationship.py:34-36), so key them that way
    w.concepts.update({normalize_predicate_py(k): v for k, v in _PRED_CONCEPTS.items()})
    return w


def embedder_concepts(world: World) -> dict[str, str]:
    """Concept table for :class:`kgray.stages.embed.HashEmbedder`."""
    return world.surface_to_concept()


def world_for(n_conversations: int, seed: int = 42, compact: bool = False) -> World:
    """The world a ``generate_transcripts(seed, n_conversations)`` call
    uses — build it without generating the transcripts (cheap; callers
    need the concept table for the embedder).

    ``compact=True`` keeps the base 24/10 vocabulary regardless of corpus
    size: the entity-resolution stage stays constant-sized, which isolates
    the data-parallel stages for engine-scaling measurements."""
    if compact:
        return build_world(seed)
    return build_world(
        seed,
        n_persons=max(24, n_conversations // 150),
        n_orgs=max(10, n_conversations // 500),
    )


_BASE = datetime(2020, 1, 1, tzinfo=timezone.utc)


def _date_str(day: int) -> str:
    return (_BASE + timedelta(days=day)).strftime("%Y-%m-%d")


def generate_transcripts(
    seed: int = 42,
    n_conversations: int = 200,
    n_days: int = 40,
    invalid_date_rate: float = 0.05,
    compact: bool = False,
) -> tuple[pd.DataFrame, World]:
    """Generate the transcripts table + its world.

    A closed pool of ``n_conversations // 2`` world facts is sampled with
    replacement by conversations, so the same fact recurs across observation
    dates (FIXTURES.md §6 scenario 1).

    The entity vocabulary scales with the corpus (~1 person per 150
    conversations beyond the base world) so canonicalization work grows
    realistically with input size instead of staying a fixed 60-entity
    toy; small worlds (tests) keep the original 24/10 vocabulary.
    """
    world = world_for(n_conversations, seed, compact=compact)
    rng = np.random.default_rng(seed + 1)

    # --- fact pool -------------------------------------------------------
    n_facts = max(20, n_conversations // 2)
    pool: list[tuple] = []
    for _ in range(n_facts):
        kind = rng.choice(["work", "end", "ceo", "acq", "live", "code", "study"],
                          p=[0.3, 0.1, 0.15, 0.1, 0.15, 0.1, 0.1])
        if kind in ("work", "end", "ceo"):
            pool.append((kind, int(rng.integers(world.n_persons)),
                         int(rng.integers(world.n_orgs)),
                         int(rng.integers(len(_POSITIONS))), int(rng.integers(n_days))))
        elif kind == "acq":
            a = int(rng.integers(world.n_orgs))
            b = (a + 1 + int(rng.integers(world.n_orgs - 1))) % world.n_orgs
            pool.append((kind, a, b, 0, int(rng.integers(n_days))))
        elif kind == "live":
            pool.append((kind, int(rng.integers(world.n_persons)),
                         int(rng.integers(len(_CITIES))), 0, -1))
        elif kind == "code":
            pool.append((kind, int(rng.integers(world.n_persons)),
                         int(rng.integers(len(_LANGS))), 0, -1))
        else:  # study
            pool.append((kind, int(rng.integers(world.n_persons)),
                         int(rng.integers(len(_ANIMALS))), 0, -1))
    world.facts = pool

    def render(fact: tuple) -> str:
        kind, s, o, x, day = fact
        date = _date_str(day)
        if rng.random() < invalid_date_rate:
            date = "an-unknown-date"
        if kind == "work":
            p = world.person_surfaces[s][int(rng.integers(3))]
            org = world.org_surfaces[o][int(rng.integers(3))]
            phrase, _ = _WORK_PHRASES[int(rng.integers(2))]
            return f"{p} {phrase.format(pos=_POSITIONS[x])} {org} on {date}."
        if kind == "end":
            p = world.person_surfaces[s][int(rng.integers(3))]
            org = world.org_surfaces[o][int(rng.integers(3))]
            return f"{p} is no longer a {_POSITIONS[x]} at {org} on {date}."
        if kind == "ceo":
            p = world.person_surfaces[s][int(rng.integers(3))]
            org = world.org_surfaces[o][int(rng.integers(3))]
            phrase, _ = _CEO_PHRASES[int(rng.integers(2))]
            return f"{p} {phrase} {org} on {date}."
        if kind == "acq":
            a = world.org_surfaces[s][int(rng.integers(3))]
            b = world.org_surfaces[o][int(rng.integers(3))]
            phrase, _ = _ACQ_PHRASES[int(rng.integers(2))]
            return f"{a} {phrase} {b} on {date}."
        if kind == "live":
            p = world.person_surfaces[s][int(rng.integers(3))]
            phrase, _ = _LIVE_PHRASES[int(rng.integers(2))]
            return f"{p} {phrase} {_CITIES[o]}."
        if kind == "code":
            p = world.person_surfaces[s][int(rng.integers(3))]
            return f"{p} codes in {_LANGS[o]}."
        p = world.person_surfaces[s][int(rng.integers(3))]
        return f"{p} studies {_ANIMALS[o]}."

    # --- conversations ---------------------------------------------------
    rows: list[tuple] = []
    roles = ["user", "assistant", "tool"]
    for c in range(n_conversations):
        conv_id = f"conv-{c:06d}"
        obs_day = int(rng.integers(n_days))
        conv_start = _BASE + timedelta(days=obs_day, hours=int(rng.integers(8, 20)),
                                       minutes=int(rng.integers(60)))
        n_turns = int(rng.integers(4, 25))
        n_fact_turns = min(n_turns, int(rng.integers(2, 9)))
        fact_slots = set(rng.choice(n_turns, size=n_fact_turns, replace=False).tolist())
        for t in range(n_turns):
            role = roles[t % 3]
            tool = "search" if role == "tool" and rng.random() < 0.5 else ""
            if t in fact_slots:
                text = render(pool[int(rng.integers(len(pool)))])
            elif role == "tool" and rng.random() < 0.5:
                text = ""
            else:
                text = _DISTRACTORS[int(rng.integers(len(_DISTRACTORS)))]
            ts = conv_start + timedelta(minutes=t)
            rows.append((conv_id, t, role, text, tool, ts))

    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"], utc=True).dt.tz_localize(None).astype("datetime64[us]")
    # shuffle on disk: pipelines must restore order (FIXTURES.md §1)
    df = df.sample(frac=1.0, random_state=seed + 2).reset_index(drop=True)
    return df, world


def write_transcripts(path: str, seed: int = 42, n_conversations: int = 200) -> World:
    df, world = generate_transcripts(seed=seed, n_conversations=n_conversations)
    df.to_parquet(path, index=False)
    return world


def transcripts_cache_path(
    n_conversations: int, seed: int = 42, tmpdir: str = "/tmp/kgray", n_files: int = 32,
    compact: bool = False,
) -> str:
    """Idempotent cached parquet DIRECTORY for a given generator config.

    Written as ``n_files`` part files so a Ray read starts with enough
    blocks to feed every downstream worker (a single file = a single input
    block = serialized pipeline)."""
    import os

    os.makedirs(tmpdir, exist_ok=True)
    w = world_for(n_conversations, seed, compact=compact)
    key = hashlib.md5(
        f"{seed}|{n_conversations}|v4|{n_files}|{w.n_persons}|{w.n_orgs}".encode()
    ).hexdigest()[:10]
    path = os.path.join(tmpdir, f"transcripts_{n_conversations}_{key}")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        df, _ = generate_transcripts(seed=seed, n_conversations=n_conversations, compact=compact)
        step = (len(df) + n_files - 1) // n_files
        for i in range(n_files):
            part = df.iloc[i * step : (i + 1) * step]
            if len(part):
                part.to_parquet(os.path.join(tmp, f"part-{i:04d}.parquet"), index=False)
        os.replace(tmp, path)
    return path
