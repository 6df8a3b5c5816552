"""TPU device properties and per-generation launch parameter tables."""

from __future__ import annotations

import dataclasses
import functools


@dataclasses.dataclass(frozen=True)
class DeviceProperties:
    """Role of reference ``gcuda::device_properties_t`` / the SM capability
    tables (cuda/device_properties.hxx): the numbers kernels tune against."""

    kind: str  # e.g. "TPU v5 lite", "cpu"
    platform: str
    generation: str  # "v4" | "v5e" | "v5p" | "v6e" | "cpu" | ...
    num_devices: int
    hbm_bytes: int
    vmem_bytes: int
    mxu_size: int  # systolic array dimension
    lanes: int  # VPU lane count (8 x 128)


_GENERATION_SPECS = {
    # generation: (hbm GiB, vmem MiB)
    "v4": (32, 16),
    "v5e": (16, 16),
    "v5p": (95, 16),
    "v6e": (32, 32),
    "cpu": (8, 16),
}


def _generation_of(kind: str) -> str:
    kind = kind.lower()
    for gen in ("v6e", "v5p", "v5e", "v4"):
        if gen in kind.replace(" ", "").replace("lite", "e"):
            return gen
    if "v5" in kind:
        return "v5e" if "lite" in kind else "v5p"
    if "cpu" in kind:
        return "cpu"
    return "v5e"


@functools.lru_cache(maxsize=1)
def get_device_properties() -> DeviceProperties:
    import jax

    d = jax.devices()[0]
    kind = str(getattr(d, "device_kind", d.platform))
    gen = _generation_of(kind)
    hbm_gib, vmem_mib = _GENERATION_SPECS.get(gen, _GENERATION_SPECS["v5e"])
    return DeviceProperties(
        kind=kind,
        platform=str(d.platform),
        generation=gen,
        num_devices=len(jax.devices()),
        hbm_bytes=hbm_gib << 30,
        vmem_bytes=vmem_mib << 20,
        mxu_size=128,
        lanes=8 * 128,
    )


@dataclasses.dataclass(frozen=True)
class LaunchParams:
    """Role of reference ``launch_box_t`` (cuda/launch_box.hxx:194): the
    kernel tile parameters selected for the attached generation."""

    window: int  # vertex window per bucket (one-hot span)
    chunk: int  # edges per grid step


# Per-generation tuned defaults for the bucketed semiring kernels
# (measured on-chip; the launch_box per-SM table analog).
_LAUNCH_TABLE = {
    "v4": LaunchParams(window=2048, chunk=256),
    "v5e": LaunchParams(window=2048, chunk=256),
    "v5p": LaunchParams(window=2048, chunk=512),
    "v6e": LaunchParams(window=4096, chunk=512),
    "cpu": LaunchParams(window=256, chunk=256),  # interpret-mode tests
}


def launch_params(kernel: str = "semiring") -> LaunchParams:
    del kernel  # single table for now; per-kernel tables slot in here
    return _LAUNCH_TABLE[get_device_properties().generation]
