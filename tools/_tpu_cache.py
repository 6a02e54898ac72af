"""Enable the persistent compilation cache for TPU tools (remote compiles
through this image's relay take minutes; cache them across processes)."""
import jax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
