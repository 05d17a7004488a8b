"""Multi-process (2x jax.distributed CPU) smoke test: per-process loader
sharding + the global contrastive loss across process boundaries.

The reference's multi-node contract (base_data_loader.py:117-138
DistributedSampler num_replicas/rank + trainer.py:41-57 AllGather_multi) is
validated here end to end: two real OS processes rendezvous through a
coordinator, shard one dataset disjointly, build a GLOBAL batch array from
process-local shards, and the jitted global-sim-matrix train step produces the
same loss on both processes — equal to a single-process run on the full batch.
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
import numpy as np
import jax

# the session sitecustomize pre-imports jax with a TPU backend plugin; force
# the CPU platform before any backend initialization
jax.config.update("jax_platforms", "cpu")

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
coord = sys.argv[3]
out_path = sys.argv[4]

jax.distributed.initialize(coordinator_address=coord, num_processes=nprocs,
                           process_id=proc_id)
assert jax.process_count() == nprocs
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tests.test_train_step import make_batch
from tests.test_tvtsv2_parity import tiny_config
from tvts_tpu.data.loader import ShardedLoader
from tvts_tpu.models.tvts_v2 import TVTSv2
from tvts_tpu.train.optim import OptimizerConfig, make_optimizer
from tvts_tpu.train.step import create_train_state, make_train_step

# --- loader sharding: disjoint per-process index sets ----------------------
class _Idx:
    def __init__(self, n):
        self.n = n
    def __len__(self):
        return self.n
    def __getitem__(self, i):
        return {"i": i}

loader = ShardedLoader(_Idx(20), batch_size=2, shuffle=True, seed=7,
                       process_index=proc_id, num_processes=nprocs,
                       collate=lambda items: [it["i"] for it in items])
loader.set_epoch(3)
local_indices = [i for batch in loader for i in batch]

# --- global-loss train step across the process boundary --------------------
cfg = tiny_config("openai")
B_local = 2
global_batch = make_batch(cfg, B=B_local * nprocs)  # identical on both procs (seeded)

model = TVTSv2(cfg)
params = model.init(jax.random.PRNGKey(0), global_batch["video"][:1],
                    global_batch["text_ids"][: cfg.num_clips],
                    global_batch["keep_ind"][:1])["params"]
tx = make_optimizer(params, OptimizerConfig(text_layers=cfg.text.layers,
                                            text_tune_layers=1))
mesh = Mesh(np.asarray(jax.devices()).reshape(nprocs, 1, 1, 1),
            ("dp", "fsdp", "sp", "tp"))
bsh = NamedSharding(mesh, P(("dp", "fsdp")))

def to_global(x):
    x = np.asarray(x)
    per = x.shape[0] // nprocs
    local = x[proc_id * per:(proc_id + 1) * per]
    return jax.make_array_from_process_local_data(bsh, local, x.shape)

batch = {}
for k, v in global_batch.items():
    batch[k] = to_global(v)

params = jax.device_put(params, NamedSharding(mesh, P()))
with mesh:
    step = make_train_step(model, tx, donate=False)
    state, aux = step(create_train_state(params, tx), batch)
    loss = float(aux["loss"])

with open(out_path, "w") as f:
    json.dump({"proc": proc_id, "indices": local_indices, "loss": loss}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_loss():
    tmp = tempfile.mkdtemp()
    worker_py = os.path.join(tmp, "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER)
    coord = f"localhost:{_free_port()}"
    nprocs = 2
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_NUM_CPU_DEVICES="1",
               PYTHONPATH=repo_root)
    env.pop("XLA_FLAGS", None)
    procs, outs = [], []
    for pid in range(nprocs):
        out = os.path.join(tmp, f"out{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker_py, str(pid), str(nprocs), coord, out],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__))))
    for p in procs:
        assert p.wait(timeout=600) == 0
    results = [json.load(open(o)) for o in outs]

    # disjoint, complete (up to drop_last truncation), equal-size shards
    sets = [set(r["indices"]) for r in results]
    assert sets[0].isdisjoint(sets[1])
    assert len(sets[0]) == len(sets[1]) == 10
    assert sets[0] | sets[1] == set(range(20))

    # both processes computed the SAME global loss
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # ... equal to a single-process run on the full batch
    import jax

    from tests.test_train_step import make_batch
    from tests.test_tvtsv2_parity import tiny_config
    from tvts_tpu.models.tvts_v2 import TVTSv2
    from tvts_tpu.train.optim import OptimizerConfig, make_optimizer
    from tvts_tpu.train.step import create_train_state, make_train_step

    cfg = tiny_config("openai")
    batch = make_batch(cfg, B=4)
    model = TVTSv2(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["video"][:1],
                        batch["text_ids"][: cfg.num_clips],
                        batch["keep_ind"][:1])["params"]
    tx = make_optimizer(params, OptimizerConfig(text_layers=cfg.text.layers,
                                                text_tune_layers=1))
    step = make_train_step(model, tx, donate=False)
    _, aux = step(create_train_state(params, tx), batch)
    assert results[0]["loss"] == pytest.approx(float(aux["loss"]), rel=1e-5)
