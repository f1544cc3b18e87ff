"""Ray-Data-native knowledge-graph construction engine.

A from-scratch, Ray-Data-idiomatic re-expression of the capabilities of
``jojowither/Joint_Entity_and_Relation_Extraction`` (joint NER + multi-head
relation extraction, per SURVEY.md; the reference checkout at
``/root/reference`` was empty at survey time, so semantics derive from
BASELINE.json's north star and the published Bekoulis et al. 2018 paper
family — see SURVEY.md §0).

Pipeline: transcripts (T0) → scorer (mentions T1 + triples T2) → entity
linking (T3) → canonicalization via iterative groupby connected components
(T4) → graph materialize (nodes T5 / edges T6), all as streaming
``ray.data.Dataset`` stages over zero-copy Arrow batches.

Library code NEVER calls ``ray.init()`` / ``ray.shutdown()`` — sessions are
owned by the driver, ``bench.py``, CLI entry points and the test fixture.
"""

__version__ = "0.1.0"
