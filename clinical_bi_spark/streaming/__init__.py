"""Structured Streaming operators (extension surface — the reference is
batch-only, SURVEY.md §2.8).

Batch/stream parity principle: every streaming aggregation here reuses the
same expressions as its batch twin in queries/events.py, so the oracle
checks on the batch form carry over to the streaming form.
"""
