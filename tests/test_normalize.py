"""Normalization parity: vectorized Arrow kernels vs the reference regexes
(itext2kg/atom/models/entity.py:30-38, relationship.py:34-36,
graph_integration/neo4j_storage.py:267-321)."""

import re

import pyarrow as pa
import pytest

from kgray.functions import normalize as nz

# scalar re-implementations lifted semantically from the reference
_LABEL = re.compile(r"[^a-zA-Z0-9]+")
_NAME = re.compile(r'[_"\-]+')


def ref_label(s):
    return _LABEL.sub("_", s).replace("&", "and").lower()


def ref_name(s):
    return _NAME.sub(" ", s.lower()).strip()


SAMPLES = [
    "John Doe", "J. Doe", "GOOGLE Inc", "Google-Inc", 'quoted "name"',
    "Tom & Jerry", "a_b-c", "  spaced  ", "Café Ñandú", "123 Corp",
    "works at", "IS_EMPLOYED-AT", "", "x",
]


def test_label_normalization_matches_reference():
    got = nz.normalize_label(pa.array(SAMPLES)).to_pylist()
    assert got == [ref_label(s) for s in SAMPLES]
    assert got == [nz.normalize_label_py(s) for s in SAMPLES]


def test_name_normalization_matches_reference():
    got = nz.normalize_name(pa.array(SAMPLES)).to_pylist()
    assert got == [ref_name(s) for s in SAMPLES]
    assert got == [nz.normalize_name_py(s) for s in SAMPLES]


def test_name_norm_examples():
    assert nz.normalize_name_py('John-"Doe"') == "john doe"
    assert nz.normalize_name_py("JOHN DOE") == "john doe"
    assert nz.normalize_name_py("J. Doe") == "j. doe"  # dots survive (entity.py:35-37)
    assert nz.normalize_label_py("Tech & Science") == "tech_science"


def ref_sanitize_label(label, default="Entity", prefix="L"):
    if not label:
        return default
    s = "".join(c for c in label if c.isalnum() or c == "_")
    if s and s[0].isdigit():
        s = prefix + s
    return s or default


@pytest.mark.parametrize("default,prefix,fn", [
    ("Entity", "L", nz.sanitize_neo4j_labels),
    ("RELATES_TO", "R", nz.sanitize_neo4j_rel_types),
])
def test_neo4j_sanitizers(default, prefix, fn):
    # note: the reference keeps unicode alnum (str.isalnum); our ASCII-only
    # variant is stricter — compare on ASCII inputs
    samples = ["Person", "9to5", "has space", "x-y", "", "###", "_ok_"]
    got = fn(pa.array(samples)).to_pylist()
    want = [ref_sanitize_label(s, default, prefix) for s in samples]
    assert got == want


def test_entity_ids_stable():
    ids = nz.entity_ids(pa.array(["john doe", "google"]), pa.array(["person", "organization"]))
    assert ids.to_pylist() == [
        nz.entity_id_py("john doe", "person"),
        nz.entity_id_py("google", "organization"),
    ]
    assert ids[0].as_py().startswith("e_") and len(ids[0].as_py()) == 18
