"""Iterative graph operators — connected components for dedup clustering.

The step after near-dup PAIR generation (ngram/MinHash/SimHash/embedding
pairs, operators/dedup.py + similarity.py): pairs are edges; the dedup unit
is the connected component (A~B and B~C put A,C in one cluster even when
A!~C directly). Each component elects a canonical member (min id); everything
else in the component is droppable.

Scale notes:
- Min-label propagation converges in <= graph-diameter rounds. Near-dup
  components are short chains (diameter is small by construction — a long
  chain means the threshold is too low), so the loop is a handful of rounds
  even at 100 TB edge counts; each round is one join + one aggregate on
  (id, comp) pairs — long/long tuples, never documents.
- Every round persists its label frame and unpersists the previous one, and
  truncates lineage with localCheckpoint every few rounds — without that the
  plan tree doubles per iteration and the driver, not the data, becomes the
  bottleneck.
- For adversarial graphs with giant high-diameter components, swap the loop
  body for the large-star/small-star rounds of Kiveris et al. ("Connected
  Components in MapReduce and Beyond", SoCC'14) — same per-round primitives
  (join + min-aggregate), logarithmic round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 4


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with its
    component's minimum vertex id.

    ``edges`` may list each pair in either (or both) directions. Returns
    ``DataFrame[id, comp]`` covering every vertex that appears in an edge.
    Raises if the propagation hasn't converged after ``max_iter`` rounds
    (unconverged labels would silently over-split clusters).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.distinct().persist()

    lbl = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .persist()
    )
    try:
        for i in range(max_iter):
            # Each vertex offers its current label to every neighbor; a vertex
            # keeps the min of its own label and all offers.
            offers = sym.join(lbl, sym.dst == lbl.id).select(
                F.col("src").alias("id"), F.col("comp")
            )
            new = (
                lbl.union(offers)
                .groupBy("id")
                .agg(F.min("comp").alias("comp"))
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                new = new.localCheckpoint(eager=False)
            new = new.persist()
            changed = (
                new.alias("n")
                .join(lbl.alias("o"), "id")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            lbl.unpersist()
            lbl = new
            if changed == 0:
                return lbl
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "component diameter exceeds the bound — use star-contraction rounds"
        )
    finally:
        sym.unpersist()
