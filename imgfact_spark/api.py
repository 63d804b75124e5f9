"""Read API over the materialized KG — the ImgFactDataset equivalent.

Reference: imgfact_api/imgfact.py.  The reference builds three in-memory
dicts by scanning a JSON index (``__init__``, imgfact.py:25-46); here the
grounding table IS the index and every retrieval is a DataFrame filter —
partition-prunable, predicate-pushed, no driver-side state.

Note on retrieve_img_from_triplet: the reference has a bug (imgfact.py:109,
``triplet != triplet`` is always False, so it returns every triplet's
images); we implement the INTENDED exact-lookup semantics and document the
divergence (SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ImgFactDataset:
    """DataFrame-backed equivalent of ``imgfact_api.imgfact.ImgFactDataset``.

    ``groundings`` is the kg_groundings table
    (s, p, o, media_ref[, score, rank, subset, ...]).
    """

    def __init__(self, groundings: DataFrame):
        self.g = groundings

    # ------------------------------------------------------------ vocab
    def load_entities(self) -> DataFrame:
        """Distinct entities (either side) — imgfact.py:49-55."""
        return (
            self.g.select(F.col("s").alias("entity"))
            .unionByName(self.g.select(F.col("o").alias("entity")))
            .distinct()
        )

    def load_relations(self) -> DataFrame:
        """Distinct relations — imgfact.py:58-62."""
        return self.g.select("p").distinct()

    # ------------------------------------------------------- retrievals
    def retrieve_img_from_entity(
        self, head: str | None = None, tail: str | None = None
    ) -> DataFrame:
        """Images whose triple matches the given head and/or tail
        (imgfact.py:65-81: either-side equality predicate)."""
        if head is None and tail is None:
            raise ValueError("provide head and/or tail")
        df = self.g
        if head is not None:
            df = df.filter(F.col("s") == head)
        if tail is not None:
            df = df.filter(F.col("o") == tail)
        return df.select("s", "p", "o", "media_ref")

    def retrieve_img_from_relation(self, relation: str) -> DataFrame:
        """Images of every triple with this relation (imgfact.py:84-97)."""
        return self.g.filter(F.col("p") == relation).select(
            "s", "p", "o", "media_ref"
        )

    def retrieve_img_from_triplet(self, s: str, p: str, o: str) -> DataFrame:
        """Exact triple lookup — the reference's INTENDED semantics
        (imgfact.py:100-113; its ``triplet != triplet`` comparison at 109 is
        a no-op bug making it return everything — intentionally diverged)."""
        return self.g.filter(
            (F.col("s") == s) & (F.col("p") == p) & (F.col("o") == o)
        ).select("s", "p", "o", "media_ref")

    def triplet_image_counts(self) -> DataFrame:
        """The triplet_path_mapping.json equivalent view (SURVEY.md §1.4):
        per-triple grounded image list sizes."""
        return self.g.groupBy("s", "p", "o").agg(
            F.count("*").alias("n_images"),
            F.sort_array(F.collect_list("media_ref")).alias("media_refs"),
        )
