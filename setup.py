"""mantis_tpu — TPU-native interleaved multi-image VLM framework
(the reference packages itself as `mantis-vl`, setup.py:1-33)."""

from setuptools import find_packages, setup

setup(
    name="mantis-tpu",
    version="0.1.0",
    description=("TPU-native (JAX/XLA/Pallas) framework for training, "
                 "evaluating and serving interleaved multi-image "
                 "vision-language models"),
    packages=find_packages(include=["mantis_tpu", "mantis_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax", "flax", "optax", "orbax-checkpoint", "einops", "numpy",
        "pillow", "transformers", "datasets", "safetensors", "pyyaml",
    ],
)
