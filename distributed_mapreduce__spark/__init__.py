"""distributed_mapreduce__spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the capabilities of the reference
system ``Oubaid-Beldi/distributed-MapReduce-`` (a Go master/worker
MapReduce running a single word-count + top-k job; see SURVEY.md), widened
into a general DataFrame analytics engine:

- ``operators/``  — composable ``f(DataFrame, ...) -> DataFrame`` query
  operators: the reference's word-count dataflow (SURVEY.md §2.1 O1-O14),
  the relational core (joins/aggs/windows, §2.2 E5-E6), event-time windows
  (E7), and the LLM-data-pipeline extensions (dedup E1/E2, similarity
  search E3, text analysis E4, multimodal plumbing).
- ``sources/``    — table/text/json readers and sinks.
- ``functions/``  — scalar column expression helpers (Go-`strings.Trim`
  parity normalizer, hashing, vector math).
- ``plans/``      — session/tuning config and plan-inspection helpers.
- ``streaming/``  — Structured Streaming variants of the window operators.

Everything is built on the public PySpark DataFrame/SQL API; the runtime
concerns of the reference (scheduling, phase barriers, straggler
re-execution, fault tolerance — SURVEY.md §2.3 R1-R10) map onto Spark's
own scheduler and are exercised by tests, not reimplemented.
"""

__version__ = "0.1.0"
