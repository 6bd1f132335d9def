"""U3 semantic-matcher accuracy harness — the reference's 8 labeled
cases (semantic_matcher.py:219-287) as an asserted pytest gate, run
through the distributed Spark pipeline (not driver-side).

Any embedder swapped into operators/semantic.py (e.g. a real
sentence-transformer on a cluster image) must keep this green —
including the "E-Learning Management System must NOT match Machine
Learning" false-positive probe (semantic_matcher.py:243).
"""

from __future__ import annotations

import pytest

SUBJECTS = [
    (1, "Machine Learning"),
    (2, "Data Structures and Algorithms"),
    (3, "Data Mining"),
    (4, "Computer Networks"),
    (5, "Database Management Systems"),
    (6, "Artificial Intelligence"),
]

# (doc_id, title, description, expected_subject, must_not_match)
CASES = [
    (1, "Deep Learning for Computer Vision", None, "Machine Learning", None),
    (2, "Introduction to Neural Networks",
     "Course about training neural networks", "Machine Learning", None),
    (3, "E-Learning Management System",
     "Building online learning platforms", None, "Machine Learning"),
    (4, "Sorting and Searching Algorithms",
     "Covers quicksort, mergesort, binary search", "Data Structures", None),
    (5, "SQL and Relational Databases", None, "Database", None),
    (6, "TCP/IP and Network Protocols", None, "Computer Networks", None),
    (7, "Mining Customer Behavior Patterns",
     "Extract insights from transaction data", "Data Mining", None),
    (8, "Introduction to AI and Expert Systems", None,
     "Artificial Intelligence", None),
]


@pytest.fixture(scope="module")
def matches(spark):
    from tlcn_oer_lakehouse_spark.operators.semantic import semantic_subject_match

    docs = spark.createDataFrame(
        [(i, f"{t} {d or ''}".strip()) for i, t, d, _e, _n in CASES],
        "doc_id long, text string",
    )
    subjects = spark.createDataFrame(SUBJECTS, "subject_id long, subject_name string")
    rows = semantic_subject_match(
        docs, subjects, threshold=0.38, top_k=3
    ).collect()
    by_doc: dict[int, list[str]] = {i: [] for i, *_ in CASES}
    names = dict(SUBJECTS)
    for r in sorted(rows, key=lambda r: (r.doc_id, r.match_rank)):
        by_doc[r.doc_id].append(names[r.subject_id])
    return by_doc


def test_accuracy_is_8_of_8(matches):
    correct = 0
    failures = []
    for doc_id, title, _desc, expected, must_not in CASES:
        got = matches[doc_id]
        hit = (
            any(expected.lower() in g.lower() for g in got)
            if expected
            else len(got) == 0
        )
        if must_not and any(must_not.lower() in g.lower() for g in got):
            hit = False
        correct += hit
        if not hit:
            failures.append((title, expected, must_not, got))
    assert correct == len(CASES), failures


def test_false_positive_probe(matches):
    """semantic_matcher.py:243 — 'learning' alone must not fire ML."""
    assert all("Machine Learning" not in g for g in matches[3])


def test_top_match_is_expected_subject(matches):
    """Beyond containment: the TOP-ranked match is the labeled subject
    for every positive case."""
    for doc_id, _t, _d, expected, _n in CASES:
        if expected:
            assert matches[doc_id], f"doc {doc_id} matched nothing"
            assert expected.lower() in matches[doc_id][0].lower()
