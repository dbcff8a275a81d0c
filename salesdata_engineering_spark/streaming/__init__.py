"""Structured Streaming surface (SURVEY §2.9 — absent in the reference).

The reference's "streaming" is rerun-the-batch-job with a MySQL ledger
remembering processed files (main.py:39-49,318-334 in /root/reference) —
a hand-rolled file source + checkpoint. Here the same capability is the
real thing:

- :mod:`.windows` — event-time operators (tumbling / sliding / session
  windows) usable identically in batch and streaming plans.
- :mod:`.runner`  — file-source streaming pipelines: readStream →
  transform → sink with checkpointing, ``Trigger.AvailableNow`` batch
  drains, ``foreachBatch`` reuse of batch mart writers, watermarked
  late-data handling and streaming dropDuplicates.
"""
