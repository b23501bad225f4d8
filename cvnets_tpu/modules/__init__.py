"""Composite blocks (parity: reference cvnets/modules/*) built from cvnets_tpu.layers
atoms. Imported lazily by model files; no registry here."""
