"""REAL multi-process execution of the multi-host path (VERDICT r3 next #4).

tests/test_multihost.py unit-tests make_pod_mesh/global_batch with mocked
process topologies; this launches 2 actual OS processes, joins them with
jax.distributed.initialize through a local coordinator (collectives ride
Gloo — the CPU stand-in for DCN), runs one DP×TP train step through the
production helpers, and checks the loss and post-step parameter norm agree
with an identically-shaped single-process run. Kills the last mocked-only
parallelism path (parallel/multihost.py bring-up).
"""

from jittor_mlp_tpu.parallel.multihost import run_local_selftest


def test_two_process_distributed_train_step_matches_single_process():
    results = run_local_selftest(num_processes=2, devices_per_process=4)
    # run_local_selftest asserts agreement internally; re-pin the topology
    assert results["ref"]["n_local"] == 8
    assert results["w0"]["n_local"] == 4 and results["w1"]["n_local"] == 4
    assert results["w0"]["n_devices"] == 8
