"""Declarative model specs.

The reference infers model "type" by substring-sniffing the filename
(``lib/libbackscrub.cc:116-130``) and hardcodes normalization per type
(``:132-148``) and decode rules (``:317-361``).  Here both become data: a
:class:`ModelSpec` carries the input normalization and the decode rule name;
the pipeline stays generic.  Filename inference is kept for CLI parity.
"""

from __future__ import annotations

import dataclasses
import os
import sys

@dataclasses.dataclass(frozen=True)
class ModelSpec:
    kind: str                      # "deeplab" | "bodypix" | "meet" | "selfie" | "multiclass" | "unknown"
    scale: float                   # input normalization: x * scale + offset
    offset: float
    decode: str                    # "argmax_person" | "threshold" | "two_channel" | "argmax_not_background"
    threshold: float = 0.65        # for decode == "threshold" (libbackscrub.cc:338)
    person_class: int = 15         # PASCAL-VOC "person" for deeplab (libbackscrub.cc:154-159)
    num_classes: int = 21          # expected output channels for argmax decodes
    # Default MXU precision for this family's convs/dots when the caller
    # does not pick one (MaskGen/FramePipeline precision=None).  "highest"
    # = 6-pass bf16 (bit-nearest to f32), "high" = 3 passes, "default" =
    # one pass.  The FLOP-heavy 257x257 families (deeplab 1.45 GFLOP/
    # frame, bodypix) pay a measured 1.3-1.4x step-time tax at HIGHEST
    # for no decode-level effect: at HIGH, tools/prec_parity.py measures
    # max |score dev vs TFLite CPU| of 4.3e-3 (deeplab) / 1.7e-3
    # (bodypix) against smallest decode margins of 2e-4 / 0.118 — argmax
    # agreement 1.0000 on the parity asset, >= 0.99977 on real photos
    # (flips confined to zero-margin class boundaries, the same class as
    # the repo's batched-serving tolerance).  One-pass DEFAULT was
    # measured and REJECTED for accuracy: deeplab score dev 1.1 flips
    # 2.3% of argmax pixels on a real photo.  The tiny meet/selfie
    # families keep HIGHEST — their step is layout-bound and the mega
    # kernel already runs their dots one-pass in bf16 mode (PERF.md).
    mxu_precision: str = "highest"
    # Default for the flat continuation-chain megakernel over the
    # post-prefix-cut 33x33 body regime (ops/megakernel.py
    # body_mega_continuation_for) when the caller does not pick
    # (MaskGen/FramePipeline edge_cont=None).  Measured per family on
    # the real chip (tools/probe_cont.py, same-session A/B, byte-exact
    # decode parity): deeplab 266.1 vs 280.8 us/step — ON; bodypix the
    # same kernel LOSES (~195 vs 167.6 us: its post-cut span is 7
    # dilation-2 C=256 DWs whose VPU traversal bill exceeds the XLA
    # conv emitter) — OFF.  PERF.md round-5 section has the full table.
    edge_cont: bool = False

    def expected_channels(self):
        """Output-channel count this decode rule needs (None = any)."""
        return {"argmax_person": self.num_classes, "two_channel": 2,
                "threshold": 1, "argmax_not_background": self.num_classes}.get(self.decode)


_SPECS = {
    "deeplab": ModelSpec("deeplab", scale=1 / 127.5, offset=-1.0,
                         decode="argmax_person", mxu_precision="high",
                         edge_cont=True),
    "bodypix": ModelSpec("bodypix", scale=1 / 255.0, offset=0.0,
                         decode="threshold", mxu_precision="high"),
    "meet": ModelSpec("meet", scale=1 / 255.0, offset=0.0, decode="two_channel"),
    "selfie": ModelSpec("selfie", scale=1 / 255.0, offset=0.0, decode="threshold"),
    # MediaPipe multiclass selfie family (256x256x6: bg, hair, body-skin,
    # face-skin, clothes, other): any non-background argmax is foreground
    "multiclass": ModelSpec("multiclass", scale=1 / 255.0, offset=0.0,
                            decode="argmax_not_background", num_classes=6),
    "unknown": ModelSpec("unknown", scale=1 / 255.0, offset=0.0, decode="threshold"),
}


def spec_for_model(model_path: str) -> ModelSpec:
    """Filename -> spec, mirroring get_modeltype (lib/libbackscrub.cc:116-130),
    extended with the multiclass selfie family."""
    name = os.path.basename(model_path)
    if "body-pix" in name:
        return _SPECS["bodypix"]
    if "deeplab" in name:
        return _SPECS["deeplab"]
    if "segm_" in name:
        return _SPECS["meet"]
    if "multiclass" in name:
        return _SPECS["multiclass"]
    if "selfie" in name:
        return _SPECS["selfie"]
    return _SPECS["unknown"]


DEFAULT_MODEL = "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite"

# The five model families shipped with the reference (SURVEY.md §2.2) —
# the canonical list every parity surface iterates (tests + bench --parity).
BUNDLED_MODELS = (
    "segm_lite_v681.tflite",
    "segm_full_v679.tflite",
    "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite",
    "deeplabv3_257_mv_gpu.tflite",
    "body-pix-float-050-8.tflite",
)

_URI_RE = None  # compiled lazily (re import kept out of the module hot path)


def _package_root() -> str:
    """Directory containing the installed/dev package — the Python analog of
    the reference's "relative to current binary location" step."""
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def search_candidates(provided: str, type_: str) -> list:
    """The ordered candidate list for steps 2-5 of resolve_path."""
    candidates = []
    # 2. $BACKSCRUB_PATH prefixes (colon separated).  The reference appends
    #    "/<type>/<name>" (app/deepseg.cc:306-314); the bare join is kept as
    #    a compatibility extension for flat model directories.
    bsp = os.environ.get("BACKSCRUB_PATH")
    if bsp:
        for b in bsp.split(":"):
            if b:
                candidates.append(os.path.join(b, type_, provided))
                candidates.append(os.path.join(b, provided))
    # 3. XDG standard data location (deepseg.cc:316-320)
    xdg = os.environ.get("XDG_DATA_HOME") or os.path.expanduser("~/.local/share")
    candidates.append(os.path.join(xdg, "backscrub", type_, provided))
    # 4. install prefix (compile-time INSTALL_PREFIX in the reference,
    #    deepseg.cc:321-324; here the Python environment prefix, overridable)
    prefix = os.environ.get("BACKSCRUB_INSTALL_PREFIX", sys.prefix)
    candidates.append(os.path.join(prefix, "share", "backscrub", type_, provided))
    # 5. relative to the "binary" — the package location (deepseg.cc:326-345):
    #    installed layout <root>/share/backscrub/<type>/, then dev tree
    #    <root>/<type>/
    root = _package_root()
    candidates.append(os.path.join(root, "share", "backscrub", type_, provided))
    candidates.append(os.path.join(root, type_, provided))
    # explicit extra roots for containers/CI (e.g. the mounted reference
    # assets) — opt-in via env, never hardcoded
    extra = os.environ.get("BACKSCRUB_TPU_MODELS" if type_ == "models"
                           else "BACKSCRUB_TPU_BACKGROUNDS")
    if extra:
        for b in extra.split(":"):
            if b:
                candidates.append(os.path.join(b, provided))
    return candidates


def resolve_path(provided: str, type_: str):
    """Resource resolution mirroring resolve_path (app/deepseg.cc:292-347).

    Order: URI-scheme passthrough -> literal path -> (stop if the name has
    path separators) -> $BACKSCRUB_PATH -> $XDG_DATA_HOME/backscrub ->
    install prefix share/backscrub -> relative-to-package (installed share/
    layout, then dev tree).  Returns None when nothing matches (the caller
    decides how to fail, like the reference's std::optional).
    """
    global _URI_RE
    if _URI_RE is None:
        import re
        # >= 2 scheme chars so Windows drive letters pass through
        # (deepseg.cc:295-298)
        _URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+\-.]{1,}:")
    if _URI_RE.match(provided):
        return provided
    # 1. exactly what was provided
    if os.path.exists(provided):
        return provided
    # PATH-like search only applies to bare names (deepseg.cc:303-305)
    if os.sep in provided:
        return None
    for cand in search_candidates(provided, type_):
        if os.path.exists(cand):
            return cand
    return None


def install_default_search_roots() -> None:
    """Entry-point helper: seed the extra search roots for this container.

    Library code never hardcodes asset locations; entry points (bench,
    tools, __graft_entry__) call this once at startup.  An installed
    ``<repo>/models`` tree (``tools/get_models.py --from-dir``) is already
    preferred by :func:`search_candidates` step 5; the env fallback below
    only matters when no installed tree exists — then the mounted
    reference assets (this container's only weight source) are appended
    as the lowest-priority root, mirroring the reference's self-contained
    install tree (CMakeLists.txt:153-163) with a dev-container escape
    hatch.  Already-set env vars always win (opt-in override).
    """
    root = _package_root()
    local = os.path.join(root, "models")
    os.environ.setdefault(
        "BACKSCRUB_TPU_MODELS",
        local if os.path.isdir(local) else "/root/reference/models")
    local_bg = os.path.join(root, "backgrounds")
    ref_bg = "/root/reference/backgrounds"
    os.environ.setdefault(
        "BACKSCRUB_TPU_BACKGROUNDS",
        local_bg if os.path.isdir(local_bg)
        else (ref_bg if os.path.isdir(ref_bg) else local_bg))


def resolve_model_path(name: str) -> str:
    """Resolve a model name/path via :func:`resolve_path` with type
    ``models`` (the reference call site, app/deepseg.cc:540)."""
    p = resolve_path(name, "models")
    if p is not None:
        return p
    raise FileNotFoundError(
        f"model {name!r} not found; searched literal path, $BACKSCRUB_PATH, "
        f"$XDG_DATA_HOME/backscrub/models, <prefix>/share/backscrub/models, "
        f"and the package tree ({_package_root()}/models). Set "
        f"BACKSCRUB_PATH or BACKSCRUB_TPU_MODELS to add search roots.")
