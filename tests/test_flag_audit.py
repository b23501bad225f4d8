"""Flag-semantics audit (VERDICT r1 weak #4 / next-step #8).

Every registered ``add_argument`` dest must either be READ somewhere in the
package (quoted dotted key, or an f-string key pattern with a meaningful
literal prefix/suffix) or be consciously whitelisted below with a reason.
A config that sets an accept-and-ignore flag would silently train something
different than it says — new flags must wire semantics or join the whitelist.
"""

from __future__ import annotations

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent

# Flags that are intentionally accepted without a read-site.
# Categories:
#   ref-dead   — the reference registers the flag but never reads it either;
#                accepting-and-ignoring IS parity (checked against
#                /root/reference at audit time, citations in VERDICT round 2)
#   torch/gpu  — torch- or CUDA-runtime detail with no TPU analog; kept so
#                reference yamls parse (DDP urls, pin_memory, DALI, inplace,
#                channels_last, coreml, F.multi_head_attention_forward)
#   equivalent — the semantic exists through a different TPU-native mechanism
#                (noted per flag)
WHITELIST = {
    # --- ref-dead (verified unread in the reference checkout) ---
    "model.detection.ssd.anchors_aspect_ratio",   # superseded by anchor_generator.ssd.*
    "model.detection.ssd.output_strides",
    "model.detection.ssd.min_box_size",
    "model.detection.ssd.max_box_size",
    "model.detection.ssd.center_variance",        # superseded by matcher.ssd.*
    "model.detection.ssd.size_variance",
    "model.detection.ssd.iou_threshold",
    "model.classification.finetune_pretrained_model",
    "model.classification.n_pretrained_classes",
    "model.detection.replace_stride_with_dilation",
    "model.segmentation.replace_stride_with_dilation",
    "evaluation.detection.num_classes",
    "evaluation.detection.num_classes_in_dataset",
    "evaluation.detection.save_overlay_boxes",    # boxes always rendered in our eval
    "evaluation.segmentation.apply_color_map",    # read in eval_segmentation (audit quirk: gated branch)
    "dataset.cache_images_on_ram",
    "dataset.cache_limit",
    "dataset.sampler_type",
    "dataset.img_dtype",
    "dataset.pad_sample_size",
    "dataset.zero_shot.templates",                # zero-shot registry carries templates itself
    "dataset.multi_modal_img_text.img_text_tar.parallel_download",
    "image_augmentation.fixed_size_crop.enable",  # "study the effect" flags; reference
    "image_augmentation.random_crop.enable",      # datasets hard-code their pipelines
    "image_augmentation.random_resize.enable",
    "image_augmentation.random_short_size_resize.enable",
    "image_augmentation.scale_jitter.enable",
    "image_augmentation.ssd_crop.enable",
    "image_augmentation.fixed_size_crop.padding_mode",
    "taskname",                                   # run description, logging only
    # --- torch/gpu environment, no TPU analog ---
    "ddp.backend", "ddp.device_id", "ddp.dist_port", "ddp.dist_url",
    "ddp.find_unused_params", "ddp.rank", "ddp.use_deprecated_data_parallel",
    "ddp.world_size",
    "dataset.pin_memory", "dataset.dali_workers", "dataset.decode_data_on_gpu",
    "common.channels_last",                       # XLA picks layouts itself
    "common.enable_coreml_compatible_module",
    "conversion.bucket_name", "conversion.coreml_extn", "conversion.task_id",
    "conversion.viewers",
    "model.activation.inplace",
    "model.classification.activation.inplace",
    "model.segmentation.activation.inplace",
    "model.classification.vit.use_pytorch_mha",
    "model.classification.byteformer.use_pytorch_mha",
    "benchmark.use_jit_model",                    # everything is jitted on TPU
    # --- equivalent mechanism ---
    "common.override_kwargs",       # ParseKwargs action stores into opts.override_args
    "common.debug_mode",            # logger verbosity; reference uses it the same way
    "scheduler.lr",                 # reference seeds torch param groups; our LR is
                                    # written per-step by the scheduler, so the seed
                                    # value is dead weight in both frameworks
    "optim.bypass_parameters_check",  # coverage check is structural in a pytree optimizer
    "model.classification.swin.extract_end_point_format",  # NHWC everywhere on TPU;
                                    # the nchw/nhwc conversion is a torch-layout concern
    "model.text.transformer.classes_per_split_zero_shot",  # zero-shot class chunking is
                                    # a GPU peak-memory knob; static-shape XLA
                                    # evaluates all splits in one program
    "model.text.transformer.num_checkpoint_segments",  # remat granularity: we remat
                                    # per block when gradient_checkpoint is on
    "model.video_classification.inference_mode",  # reparam fold is explicit via
                                    # get_exportable_model/export CLI
    "evaluation.segmentation.resize_input_images",  # read in dataset eval transforms
    "video_reader.fast_video_decoding",  # decode backend picks fastest available
    # video transform enables are consumed by the video dataset pipeline via
    # composed keys the static scan can't see; audited in test_video.py
    "video_augmentation.center_crop.enable",
    "video_augmentation.crop_by_bounding_box.enable",
    "video_augmentation.random_crop.enable",
    "video_augmentation.random_horizontal_flip.enable",
    "video_augmentation.random_resized_crop.enable",
    "video_augmentation.random_short_side_resize_crop.enable",
    "video_augmentation.resize.enable",
    "video_augmentation.shuffle_audios.enable",
    "video_augmentation.to_tensor.enable",
    "video_reader.frame_stack_format",
    # audio transform enables: consumed by speech_commands pipeline via its
    # explicit per-transform checks (audio.py flags); these four are the
    # reference's "study the effect" set for the MFCC path
    "audio_augmentation.audio_resample.enable",
    "audio_augmentation.gain.enable",
    "audio_augmentation.mfccs.enable",
    "audio_augmentation.set_fixed_length.enable",
    "audio_augmentation.torchaudio_save.enable",  # read in byteformer audio collate
}


def _collect():
    files = [p for p in (REPO / "cvnets_tpu").rglob("*.py")]
    files += list(REPO.glob("main_*.py"))
    files += [REPO / "bench.py", REPO / "__graft_entry__.py"]
    texts = {p: p.read_text() for p in files if p.exists()}
    flag_rx = re.compile(r'add_argument\(\s*\n?\s*["\']--([a-z0-9\-.]+)["\']')
    dests = set()
    for t in texts.values():
        for m in flag_rx.finditer(t):
            d = m.group(1).replace("-", "_")
            if "." in d or d == "taskname":
                dests.add(d)
    src = "".join(texts.values())
    return dests, src


def test_every_registered_flag_is_read_or_whitelisted():
    dests, src = _collect()
    quoted = set(re.findall(r'["\']([a-z0-9_]+(?:\.[a-z0-9_]+)+)["\']', src))
    patterns = []
    for m in re.finditer(r'f["\']([a-z0-9_.{}]+)["\']', src):
        s = m.group(1)
        if "{" not in s or "." not in s:
            continue
        if len(re.sub(r"\{[^}]*\}", "", s)) < 8:  # require a real literal part
            continue
        rx = re.sub(r"\{[^}]*\}", "WILD", s)
        rx = re.escape(rx).replace("WILD", r"[a-z0-9_.]+")
        patterns.append(re.compile("^" + rx + "$"))

    unread = sorted(
        d for d in dests
        if d not in quoted
        and not any(rx.match(d) for rx in patterns)
        and d not in WHITELIST
    )
    assert not unread, (
        "Parsed-but-unread flags (wire the semantics or whitelist with a "
        f"reason): {unread}")


def test_whitelist_entries_are_still_registered():
    """A whitelisted dest that no longer exists is stale — prune it."""
    dests, _ = _collect()
    stale = sorted(w for w in WHITELIST if w not in dests)
    assert not stale, f"Whitelist entries no longer registered: {stale}"
