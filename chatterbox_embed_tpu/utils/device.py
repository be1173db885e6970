"""Device helpers.

On remote-dispatch backends (the axon TPU tunnel) every eager op is a network
round trip, so parameter initialisation — thousands of tiny RNG ops — must run
on the host CPU backend and transfer once.
"""
from __future__ import annotations

import os

import jax


def init_on_cpu(init_fn, *args, **kwargs):
    """Run an init function on the CPU backend, return host-resident pytree.

    Array arguments (PRNG keys) are moved to CPU first: JAX places ops where
    their operands live, so a device-resident key would drag the whole init
    back onto the accelerator regardless of default_device.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return init_fn(*args, **kwargs)

    def to_cpu(x):
        return jax.device_put(x, cpu) if isinstance(x, jax.Array) else x

    args = jax.tree.map(to_cpu, args)
    kwargs = jax.tree.map(to_cpu, kwargs)
    with jax.default_device(cpu):
        return init_fn(*args, **kwargs)


def to_default_device(tree):
    """Move a pytree to the default (accelerator) device with ONE transfer
    per dtype.

    Naive jax.device_put(tree) issues one transfer per leaf; over a
    high-latency tunnel ~1800 leaves take minutes. Instead we pack the leaves
    into one flat buffer per dtype on the host, ship those, and carve them
    back up on-device with chunked jitted programs of static slices +
    reshapes (free for XLA; no byte-level bitcasts, which tile
    catastrophically).
    """
    import numpy as np

    dev = jax.devices()[0]
    leaves, treedef = jax.tree.flatten(tree)
    if len(leaves) <= 8:
        return jax.device_put(tree, dev)

    canon = {np.dtype(np.float64): np.dtype(np.float32),
             np.dtype(np.int64): np.dtype(np.int32),
             np.dtype(np.uint64): np.dtype(np.uint32)}
    arrays = []
    for leaf in leaves:
        arr = np.asarray(leaf)
        if arr.dtype in canon:  # match jax's x64-disabled canonicalisation
            arr = arr.astype(canon[arr.dtype])
        arrays.append(arr)

    order = {}     # dtype -> list of (leaf_idx, offset, shape)
    chunks = {}    # dtype -> list of flat arrays
    offsets = {}
    for i, arr in enumerate(arrays):
        dt = arr.dtype
        off = offsets.get(dt, 0)
        order.setdefault(dt, []).append((i, off, arr.shape))
        chunks.setdefault(dt, []).append(np.ascontiguousarray(arr).reshape(-1))
        offsets[dt] = off + arr.size
    bufs = {str(dt): np.concatenate(ch) for dt, ch in chunks.items()}

    bufs_dev = jax.device_put(bufs, dev)

    # carve each dtype buffer back into leaves with SMALL jitted programs
    # (<=256 slices each): one monolithic program's XLA compile time grows
    # superlinearly in the slice count — the ~1500-leaf s3gen tree took 20 s
    # of XLA compile per process, vs well under a second per chunk on a
    # local host. (Through the axon tunnel each chunk still pays a remote
    # compile RTT and the tunnel's compile-option hash is session-unstable,
    # so the persistent cache only helps within a session there; on real
    # hosts the chunks compile fast AND cache deterministically.)
    group = 256
    leaves_dev = [None] * len(arrays)
    for dt, entries in order.items():
        buf = bufs_dev[str(dt)]
        for g0 in range(0, len(entries), group):
            part = entries[g0:g0 + group]

            def unpack_part(buf, _part=tuple((off, shape) for _, off, shape in part)):
                return [jax.lax.slice(buf, (off,),
                                      (off + int(np.prod(shape, dtype=np.int64)),)
                                      ).reshape(shape)
                        for off, shape in _part]

            outs = jax.jit(unpack_part)(buf)
            for (i, _, _), o in zip(part, outs):
                leaves_dev[i] = o
    return jax.tree.unflatten(treedef, leaves_dev)


def free_hbm_bytes(default: int = 12 * 1024**3) -> int:
    """Best-effort free-HBM estimate for the default device.

    TPU backends report `memory_stats()` (bytes_limit / bytes_in_use); CPU
    and remote-dispatch backends that lack it fall back to `default`
    (12 GiB ≈ a v5e's 16 GiB minus the resident bf16 checkpoint). Used to
    derive batching knobs (tts._derive_s3gen_sub_batch); never fatal."""
    try:
        ms = jax.devices()[0].memory_stats()
        free = int(ms["bytes_limit"]) - int(ms["bytes_in_use"])
        if free > 0:
            return free
    except Exception:  # noqa: BLE001 — stats are an optimisation input only
        pass
    return default


_COMPILE_CACHE_DIR: str | None = None


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Persistent XLA compilation cache: serving cold-starts pay ~2 min of
    compiles for the standard shape buckets; a disk cache makes every process
    after the first start hot (measured 0.53 s -> 0.02 s through the axon
    tunnel). Idempotent; an explicit `cache_dir` re-points an active cache.
    Disable with CHATTERBOX_COMPILE_CACHE=0; CHATTERBOX_COMPILE_CACHE_MIN_S
    sets the min-compile-time threshold (default 0: on remote-dispatch
    backends even trivial programs cost a full round-trip to re-compile).
    Returns True when active.

    The default directory is PARTITIONED BY BACKEND PLATFORM: on tunnel
    backends the remote helper compiles every program — including
    cpu-platform ones — on the REMOTE host, whose machine features (AMX,
    avx512 prefer-no-gather/scatter) differ from this container's CPU.
    Deserializing such an entry into a local cpu-platform process is a
    hard SIGSEGV inside compilation_cache.get_executable_and_time (hit by
    the int8-KV phased-cache test when a probe-smoke had shared its dir),
    so cpu sessions and tunnel sessions must never share a namespace."""
    global _COMPILE_CACHE_DIR
    if os.getenv("CHATTERBOX_COMPILE_CACHE", "1") == "0":
        return False
    path = (cache_dir or os.getenv("CHATTERBOX_COMPILE_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "chatterbox_embed_tpu", "xla",
                            jax.default_backend()))
    if _COMPILE_CACHE_DIR is not None and path == _COMPILE_CACHE_DIR:
        return True
    try:
        min_s = float(os.getenv("CHATTERBOX_COMPILE_CACHE_MIN_S", "0"))
    except ValueError:
        min_s = 0.0
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_s)
        _COMPILE_CACHE_DIR = path
        return True
    except Exception:  # noqa: BLE001 — cache is an optimisation, never fatal
        return False
