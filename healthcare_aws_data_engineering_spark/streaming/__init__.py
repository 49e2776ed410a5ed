"""Structured Streaming layer.

Parity piece: the reference's only incremental mechanism is Glue job
bookmarks + append writes (``Glue_tranformation_json_parquet.py:51-56,
186-199`` — each run processes only new S3 objects). SURVEY §2.9 maps that
to a Structured Streaming file source with ``Trigger.AvailableNow`` and a
checkpoint: exactly-once file processing, append sinks, then the job exits.
:mod:`.incremental` implements it for the FHIR raw→curated ETL.

Extension (flagged per SURVEY §2.9 — NOT reference parity): watermarked
event-time windowed aggregation over an events stream in :mod:`.windows`.
"""
