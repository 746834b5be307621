"""Operator library (SURVEY.md §2).

Reference parity (Kafka Streams DSL subset):

- :mod:`.rekey`        — P1/P2 selectKey / map-rekey.
- :mod:`.windowed_agg` — A1-A4 tumbling-window aggregate + window unwrap.
- :mod:`.joins`        — J1 stream-table left join + the wider join surface.

North-star extensions (100 TB LLM-data-pipeline ops):

- :mod:`.dedup`        — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  embedding-cosine dedup.
- :mod:`.similarity`   — brute-force + LSH-bucketed cosine top-k ANN.
- :mod:`.text`         — language-ID, quality scoring, token counts,
  fingerprints.
- :mod:`.multimodal`   — binary payload columns + decode/feature plumbing.
"""

from .rekey import rekey, select_key
from .windowed_agg import unwrap_window, windowed_call_agg

__all__ = ["rekey", "select_key", "windowed_call_agg", "unwrap_window"]
