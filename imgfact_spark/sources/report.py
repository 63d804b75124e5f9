"""S13: markdown gallery + stats report sink.

Reference: dataset_construction/clustering/cluster.py:108-128 writes, per
triplet, a ``*_selected.md`` gallery (triple header + an ``<img>`` tag per
kept representative) and a stats file (triple, kept image ids, then
``n_clusters deleted silhouette total``), plus the running averages shown
on the progress bar (cluster.py:176-182).

This is a driver-side formatter over a SMALL result (the kept
representatives per triplet — already reduced by clustering), not a
distributed sink: rows are capped at ``max_rows`` and collected.  For the
full-corpus case, write the representatives table as parquet and report on
an aggregated slice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_cluster_report(
    kept: DataFrame,
    out_dir: str,
    name: str = "Triplelist001",
    max_rows: int = 100_000,
) -> dict[str, str]:
    """Write ``{name}_selected.md`` and ``{name}.txt`` from the output of
    ``cluster_representatives``.  Returns the written paths."""
    rows = (
        kept.orderBy("s", "p", "o", "cluster_id")
        .limit(max_rows)
        .collect()
    )
    os.makedirs(out_dir, exist_ok=True)
    md_path = os.path.join(out_dir, f"{name}_selected.md")
    stats_path = os.path.join(out_dir, f"{name}.txt")

    by_triple: dict[tuple, list] = {}
    for r in rows:
        by_triple.setdefault((r["s"], r["p"], r["o"]), []).append(r)

    n_t = len(by_triple)
    sum_clusters = sum_deleted = sum_sil = 0
    n_sil = 0
    with open(md_path, "w", encoding="utf-8") as md, open(
        stats_path, "w", encoding="utf-8"
    ) as st:
        for (s, p, o), reps in sorted(by_triple.items()):
            md.write(f"{s}\t{p}\t{o}\n")
            md.write(
                " ".join(
                    f'<img src="{r["media_ref"]}" height="100"/>' for r in reps
                )
                + "\n"
            )
            first = reps[0]
            n_clusters = first["n_clusters"]
            n_deleted = first["n_deleted"]
            sil = first["silhouette"]
            total = n_clusters + n_deleted
            st.write(f"{s}\t{p}\t{o}\n")
            st.write("\t".join(r["media_ref"] for r in reps) + "\n")
            st.write(f"{n_clusters} {n_deleted} {sil} {total}\n")
            sum_clusters += n_clusters
            sum_deleted += n_deleted
            if sil is not None:
                sum_sil += sil
                n_sil += 1
        if n_t:
            st.write(
                "avg_cluster_num: {:.4f} deleted: {:.4f} score: {:.4f}\n".format(
                    sum_clusters / n_t,
                    sum_deleted / n_t,
                    (sum_sil / n_sil) if n_sil else float("nan"),
                )
            )
    return {"gallery": md_path, "stats": stats_path}
