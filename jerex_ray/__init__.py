"""jerex_ray — a Ray-Data-native knowledge-graph construction engine.

Re-implements the query/data-processing capabilities of lavis-nlp/jerex
(EACL 2021, arXiv:2102.05980) as idiomatic Ray Data pipelines:
span-based mention localization, coreference clustering, entity typing
and multi-instance relation classification over multi-turn transcript
tables, plus the large-scale training-data operators (dedup families,
similarity search, text analysis) such a pipeline needs at 100 TB.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions
are owned by the driver, ``bench.py`` and the test fixture.
"""

from jerex_ray.config import PipelineConfig
from jerex_ray.types import TypeVocabulary, DEFAULT_TYPES

__all__ = ["PipelineConfig", "TypeVocabulary", "DEFAULT_TYPES"]
__version__ = "0.1.0"
