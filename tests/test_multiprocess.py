"""True multi-process execution (jax.distributed): two processes, each
with two virtual CPU devices, form one 4-way data-parallel mesh and run
sharded HTM steps with per-process input feeding — the multi-host story
of `parallel/distributed.py` + `parallel/mesh.py` end to end."""

import os
import socket
import subprocess
import sys
import textwrap

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    port, rank, repo = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, repo)
    from bithtm_tpu.parallel.distributed import (
        initialize, local_batch_slice, make_global_array)
    initialize(f"localhost:{port}", num_processes=2, process_id=rank)
    import numpy as np, jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from bithtm_tpu import htm_init_batch, make_htm_config
    from bithtm_tpu.parallel.mesh import (
        make_mesh, shard_batched_state, sharded_step)
    assert jax.device_count() == 4 and jax.local_device_count() == 2
    cfg = make_htm_config(64, 64, 4, 4, segments_per_column=4,
        segment_activation_threshold=2, segment_matching_threshold=2,
        segment_sampling_synapses=8)
    B = 8
    mesh = make_mesh(n_data=4, n_model=1)
    state = shard_batched_state(htm_init_batch(jax.random.key(0), cfg, B),
                                mesh)
    step = sharded_step(cfg, mesh, learning=True)
    rng = np.random.RandomState(0)
    for t in range(3):
        local = rng.rand(B, cfg.input_dim) < 0.2
        x = make_global_array(local[local_batch_slice(B)], mesh,
                              P("data", None))
        state, metrics = step(state, x)
    shard = np.asarray(jax.device_get(
        metrics["bursting"].addressable_shards[0].data))
    print(f"MULTIHOST_OK rank={rank} burst={shard.tolist()}", flush=True)
""")


def test_two_process_data_parallel(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(rank), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for rank, out in enumerate(outs):
        assert f"MULTIHOST_OK rank={rank}" in out, out[-2000:]
