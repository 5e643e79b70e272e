"""Multi-host wrapper: single-process no-op + global mesh construction."""
import jax

from instsearch_tpu.parallel import global_shard_mesh, initialize


def test_initialize_single_process_noop():
    initialize()   # must not raise or try to contact a coordinator
    assert jax.process_count() == 1


def test_global_shard_mesh_covers_all_devices():
    mesh = global_shard_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("shard",)
