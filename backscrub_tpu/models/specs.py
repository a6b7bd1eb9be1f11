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

@dataclasses.dataclass(frozen=True)
class ModelSpec:
    kind: str                      # "deeplab" | "bodypix" | "meet" | "selfie" | "multiclass" | "unknown"
    scale: float                   # input normalization: x * scale + offset
    offset: float
    decode: str                    # "argmax_person" | "threshold" | "two_channel" | "argmax_not_background"
    threshold: float = 0.65        # for decode == "threshold" (libbackscrub.cc:338)
    person_class: int = 15         # PASCAL-VOC "person" for deeplab (libbackscrub.cc:154-159)
    num_classes: int = 21          # expected output channels for argmax decodes

    def expected_channels(self):
        """Output-channel count this decode rule needs (None = any)."""
        return {"argmax_person": self.num_classes, "two_channel": 2,
                "threshold": 1, "argmax_not_background": self.num_classes}.get(self.decode)


_SPECS = {
    "deeplab": ModelSpec("deeplab", scale=1 / 127.5, offset=-1.0, decode="argmax_person"),
    "bodypix": ModelSpec("bodypix", scale=1 / 255.0, offset=0.0, decode="threshold"),
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

_SEARCH_PATHS = [
    os.environ.get("BACKSCRUB_PATH", ""),
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "models"),
    os.path.join(os.environ.get("XDG_DATA_HOME", os.path.expanduser("~/.local/share")), "backscrub", "models"),
    "/root/reference/models",
]


def resolve_model_path(name: str) -> str:
    """Resolve a model name/path, mirroring resolve_path (app/deepseg.cc:292-347):
    literal path first, then $BACKSCRUB_PATH (colon separated), repo-local
    ``models/``, XDG data dir, and the mounted reference assets."""
    if os.path.isabs(name) or os.path.exists(name):
        return name
    for base in _SEARCH_PATHS:
        for b in base.split(":"):
            if not b:
                continue
            cand = os.path.join(b, name)
            if os.path.exists(cand):
                return cand
    raise FileNotFoundError(f"model {name!r} not found in {_SEARCH_PATHS}")
