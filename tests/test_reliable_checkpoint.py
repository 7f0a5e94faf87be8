"""Cluster-durable checkpointing for the iterative operators (VERDICT r4
ask #3): when the session has a reliable checkpoint dir configured,
session.truncate_lineage must route every iterative operator's lineage
truncation through `.checkpoint()` (fault-tolerant storage, survives
executor loss) instead of `localCheckpoint` (executor blocks).

Runs in a SUBPROCESS with its own SparkSession because setCheckpointDir
is session-global and has no unset — the shared pytest session must keep
its local-mode default.
"""

import subprocess
import sys

SCRIPT = r"""
import sys, os
sys.path.insert(0, "/root/repo")
from spdb_spark.session import get_spark, truncate_lineage

ckpt_dir = sys.argv[1]
spark = get_spark("reliable-ckpt-test", master="local[4]", shuffle_partitions=4)

# default (no checkpoint dir): truncate_lineage stays local
df = spark.range(10)
t = truncate_lineage(df, eager=True)
assert t.count() == 10
assert not os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else True

spark.sparkContext.setCheckpointDir(ckpt_dir)

# the helper now uses reliable checkpoint()
t2 = truncate_lineage(spark.range(7), eager=True)
assert t2.count() == 7
ckpt_files = []
for root, _dirs, files in os.walk(ckpt_dir):
    ckpt_files += files
assert ckpt_files, "reliable checkpoint wrote nothing to the checkpoint dir"

# end-to-end: the iterative operators run and give correct answers with
# reliable checkpointing active (checkpoint_every=1 forces the path)
from spdb_spark.functions.dedup import dup_clusters
pairs = spark.createDataFrame(
    [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
    "id_a long, id_b long",
)
got = {
    (r.id, r.cluster_id)
    for r in dup_clusters(pairs, checkpoint_every=1).collect()
}
want = {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20)}
assert got == want, got

from spdb_spark.operators.voxel import connected_components
vox = spark.createDataFrame(
    [(0, 0, 0, 0, 5), (0, 1, 0, 0, 5), (0, 2, 0, 0, 5), (0, 9, 9, 9, 7)],
    "t int, x int, y int, z int, value int",
)
cc = connected_components(vox, checkpoint_every=1)
comps = {r.component for r in cc.collect()}
assert len(comps) == 2, comps

from spdb_spark.functions.text import train_bpe_merges
docs = spark.createDataFrame([("a b a b a b",)] * 3, "text string")
merges = train_bpe_merges(docs, "text", n_merges=3)
assert merges and merges[0][1:3] == ("a", "b")

print("RELIABLE_OK")
spark.stop()
"""


def test_reliable_checkpoint_path_end_to_end(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(tmp_path / "ckpt")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "RELIABLE_OK" in out.stdout, out.stdout + "\n" + out.stderr[-3000:]
