from jerex_ray.sources.transcripts import (
    generate_transcripts_table,
    ground_truth_triples,
    read_synthetic_transcripts,
)

__all__ = [
    "generate_transcripts_table",
    "ground_truth_triples",
    "read_synthetic_transcripts",
]
