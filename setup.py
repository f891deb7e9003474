"""Package setup (reference ships setup.py building CUDA extensions; here the only native
piece — the C++ SPC builder — auto-builds at import via wisp_tpu/csrc/build.sh, so setup is
pure-python)."""

from setuptools import find_packages, setup

setup(
    name="wisp_tpu",
    version="0.1.0",
    description="TPU-native neural fields framework (JAX/XLA/Pallas) with the "
                "capabilities of kaolin-wisp",
    packages=find_packages(include=["wisp_tpu", "wisp_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "optax", "numpy", "pyyaml"],
    extras_require={
        "full": ["orbax-checkpoint", "pandas", "pillow", "opencv-python", "imageio",
                 "scipy", "tensorboard"],
    },
    package_data={"wisp_tpu": ["csrc/*.cpp", "csrc/*.sh"]},
)
