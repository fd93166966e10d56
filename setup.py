"""Package setup (reference `copo_code/setup.py` analogue) with optional
native extension build (C++ scene baker, copo_tpu/native/)."""

import os

from setuptools import Extension, find_packages, setup

ext_modules = []
if os.environ.get("COPO_TPU_BUILD_NATIVE", "1") != "0":
    ext_modules.append(
        Extension(
            "copo_tpu.native._scenebake",
            sources=["copo_tpu/native/scenebake.cpp"],
            extra_compile_args=["-O3", "-march=native", "-fopenmp", "-std=c++17"],
            extra_link_args=["-fopenmp"],
            optional=True,   # numpy fallback exists
        )
    )

setup(
    name="copo_tpu",
    version="0.1.0",
    description=(
        "TPU-native multi-agent driving RL: vectorized MetaDrive-style scenes "
        "+ IPPO/CCPPO/CoPO trainers as jit-compiled JAX programs"
    ),
    packages=find_packages(include=["copo_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "orbax-checkpoint", "numpy"],
    extras_require={"viz": ["matplotlib", "Pillow"], "test": ["pytest"]},
    ext_modules=ext_modules,
)
