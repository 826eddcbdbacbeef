from u2seg_tpu.models.build import META_ARCH_REGISTRY, build_model, register_meta_arch

__all__ = ["META_ARCH_REGISTRY", "build_model", "register_meta_arch"]
