"""Package setup (parity: reference setup.py console scripts, :42-50)."""

from setuptools import find_packages, setup

VERSION = "0.1.0"

setup(
    name="cvnets_tpu",
    version=VERSION,
    description="TPU-native computer-vision training framework "
                "(CVNets-capability rebuild in JAX/Flax/Pallas)",
    packages=find_packages(include=["cvnets_tpu*"]),
    py_modules=["main_train", "main_eval", "main_benchmark", "main_conversion",
                "main_loss_landscape", "bench"],
    python_requires=">=3.10",
    install_requires=[
        "jax", "flax", "optax", "orbax-checkpoint", "numpy", "pyyaml", "Pillow",
    ],
    entry_points={
        "console_scripts": [
            "cvnets-tpu-train = main_train:main_worker",
            "cvnets-tpu-eval = main_eval:main_worker",
            "cvnets-tpu-eval-seg = cvnets_tpu.engine.eval_segmentation:main_segmentation_evaluation",
            "cvnets-tpu-eval-det = cvnets_tpu.engine.eval_detection:main_detection_evaluation",
            "cvnets-tpu-convert = main_conversion:main_worker_conversion",
            "cvnets-tpu-benchmark = main_benchmark:main_benchmark",
            "cvnets-tpu-loss-landscape = main_loss_landscape:main_loss_landscape",
        ],
    },
)
