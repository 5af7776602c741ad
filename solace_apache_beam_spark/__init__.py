"""solace_apache_beam_spark — a PySpark-native analytics engine.

Re-expresses the data-processing surface of the reference repo
``gurusudhanshu/solace-apache-beam`` (a Beam ``UnboundedSource`` connector
for Solace PubSub+ plus sample pipelines) as an idiomatic Spark engine:

- batch operator library over the message-envelope data model
  (``operators/``, mirrors SURVEY.md §2),
- a custom PySpark streaming ``DataSource`` with partition-per-queue,
  commit-time ack and bounded modes (``sources/``, mirrors
  ``SolaceIO.java`` / ``UnboundedSolaceReader.java``),
- streaming pipelines + windowed-file / warehouse sinks (``streaming/``,
  ``sinks/``, mirrors the samples),
- LLM-data-pipeline operators: dedup, similarity search, text analysis,
  multimodal columns (``llm/``), designed partition-parallel for
  100 TB-scale inputs.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join strategy, AQE and codegen; Python UDFs appear only where built-ins
cannot express the semantics (Arrow-batched, never per-row).
"""

__version__ = "0.1.0"

import os as _os

# Python workers (custom DataSource / UDF deserialization) import this
# package by name; make sure the repo root is on PYTHONPATH before any
# SparkSession (and its JVM) is created.
_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _repo_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = f"{_repo_root}{_os.pathsep}{_pp}" if _pp else _repo_root

from solace_apache_beam_spark.session import get_spark  # noqa: F401,E402
