from multimodal_flows_tpu.utils.logger import MetricsLogger, SimpleLogger


def enable_compilation_cache(path: str = "~/.cache/mmf_tpu_xla") -> None:
    """Enable JAX's persistent compilation cache (first compiles over the
    remote TPU tunnel take 30-120s; the cache makes reruns instant)."""
    import os

    import jax

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


__all__ = ["MetricsLogger", "SimpleLogger", "enable_compilation_cache"]
