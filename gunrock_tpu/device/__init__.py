"""Device runtime: TPU properties and per-generation kernel parameters.

Role of the reference ``gcuda::`` device layer (reference
include/gunrock/cuda/device_properties.hxx — compile-time SM capability
tables — and cuda/launch_box.hxx:32-200 — per-architecture kernel launch
parameters selected by SM flags). The TPU analog: query the attached
generation and select Pallas window/chunk parameters from a per-
generation table (the ``launch_box_t`` role; BlockSpec shapes are the
launch dimensions).
"""

from gunrock_tpu.device.properties import (  # noqa: F401
    DeviceProperties,
    LaunchParams,
    get_device_properties,
    launch_params,
)
