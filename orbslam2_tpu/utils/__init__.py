

def fetch(*arrays):
    """Batched device->host readback: wait for the computation once, start
    ALL host copies asynchronously, then materialize. On remote-attached
    TPU runtimes each bare np.asarray(device_array) is a full ~70 ms round
    trip executed SEQUENTIALLY; this overlaps them into ~one. (Same pattern
    as the fused tracker's per-frame readback, tracking._track_fused.)"""
    import jax
    import numpy as np
    jax.block_until_ready(arrays[0])
    for a in arrays:
        a.copy_to_host_async()
    return [np.asarray(a) for a in arrays]
