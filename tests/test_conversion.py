"""StableHLO export round-trip (reference main_conversion.py + the
pytorch_to_coreml assertion_check contract)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _load_repo_main_conversion():
    """Import THIS repo's main_conversion by path: the reference-parity tests
    put /root/reference on sys.path, which also has a main_conversion.py."""
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "..", "main_conversion.py")
    spec = importlib.util.spec_from_file_location("_repo_main_conversion", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_export_roundtrip_matches_jitted_forward(tmp_path):
    main_worker_conversion = _load_repo_main_conversion().main_worker_conversion

    mlir_path = main_worker_conversion(args=[
        "--model.classification.name", "mobilenetv2",
        "--model.classification.n-classes", "7",
        "--dataset.category", "classification",
        "--common.results-loc", str(tmp_path),
    ])
    assert os.path.isfile(mlir_path)
    text = open(mlir_path).read()
    assert "stablehlo" in text or "mhlo" in text or "func.func" in text
    bin_path = mlir_path.replace("model_stablehlo.mlir", "model_stablehlo.bin")
    assert os.path.getsize(bin_path) > 1000


def test_export_reparam_folds_mobileone(tmp_path):
    """--conversion.reparameterize must produce a deploy-form export whose
    logits match the trained branched model (reparam equivalence through the
    full CLI path, not just the block level)."""
    import jax
    import jax.numpy as jnp

    from cvnets_tpu.models import get_model
    from cvnets_tpu.options.opts import get_conversion_arguments
    from cvnets_tpu.utils.reparam_utils import get_exportable_params

    args = [
        "--model.classification.name", "mobileone",
        "--model.classification.n-classes", "7",
        "--dataset.category", "classification",
    ]
    opts = get_conversion_arguments(args=args)
    setattr(opts, "model.classification.mobileone.mode", "s0")
    train_model = get_model(opts)
    rng = jax.random.PRNGKey(0)
    dummy = train_model.dummy_input_and_label(1)
    tv = train_model.init({"params": rng, "dropout": rng}, dummy["samples"],
                          training=False)

    inf_opts = get_conversion_arguments(args=args)
    setattr(inf_opts, "model.classification.mobileone.mode", "s0")
    setattr(inf_opts, "model.classification.mobileone.inference_mode", True)
    inf_model = get_model(inf_opts)
    folded = get_exportable_params(tv["params"], tv.get("batch_stats", {}))

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        dummy["samples"].shape).astype(np.float32))
    want = train_model.apply(tv, x, training=False)
    got = inf_model.apply({"params": folded}, x, training=False)
    want = want["logits"] if isinstance(want, dict) else want
    got = got["logits"] if isinstance(got, dict) else got
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-3)
