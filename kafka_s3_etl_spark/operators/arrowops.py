"""Arrow-native Python operators (DataFrame.mapInArrow).

mapInPandas pays an Arrow->pandas->Arrow materialization per batch;
mapInArrow hands the raw pyarrow.RecordBatch to Python and takes one
back — the zero-copy path for feature extraction whose kernels exist
in pyarrow.compute. Same executor-shipping requirements as the pandas
ops (workers import this module; `load_table` wires
ensure_workers_can_import).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def token_stats_arrow(documents: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, n_tokens, n_chars) computed entirely
    with pyarrow.compute kernels inside mapInArrow.

    n_tokens counts split-on-single-space pieces with empties KEPT —
    `pc.split_pattern` matches Spark's `split(text, ' ')` and DuckDB's
    `string_split` exactly, so the count is oracle-exact. Partition-
    preserving: no shuffle, one scan, no pandas anywhere."""
    import pyarrow as pa

    def stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")),
                        pa.int64(),
                    ),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                names=["doc_id", "n_tokens", "n_chars"],
            )

    return documents.mapInArrow(
        stats, "doc_id long, n_tokens long, n_chars long"
    )
