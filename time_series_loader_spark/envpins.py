r"""Environment-fingerprint canary constants + pinned-values loader.

Lives INSIDE the package (next to ``resources/env_pins.json``) because
the gate entry consumes these at ``oracle_sql()`` time — importing them
from the un-packaged ``tools/`` build scripts would couple all 50
oracles to the repo checkout layout (r8 review finding). The generator
``tools/gen_env_pins.py`` imports FROM here, never the reverse.

The canaries are chosen to EXPOSE engine differences, not avoid them:

- ``CASE_CANARY`` — dotted capital İ (the classic locale/ICU lowering
  trap), final Σ, capital ẞ, titlecase ǅ, Cyrillic, CJK, the ﬁ ligature;
- ``WS_CANARY`` — one candidate per whitespace class an engine's
  ``\s`` may or may not match (tab, LF, VT, FF, CR, NBSP, OGHAM, LINE
  SEPARATOR, IDEOGRAPHIC SPACE);
- ``NFC_CANARY`` — a decomposed e+U+0301 that NFC must compose and a
  ZWSP that control-stripping must drop.
"""

from __future__ import annotations

import json
import os

CASE_CANARY = "AÄÉİΣẞǅ Страж 中文 ﬁX"
WS_CANARY = "a b\tc\ndef\rg h i j　k"
NFC_CANARY = "café zw​sp"
LN_KS = [2, 10, 501, 28160, 999983]

PINS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "resources", "env_pins.json"
)


def load_pins() -> dict[str, str]:
    """The frozen environment pins (regenerate: tools/gen_env_pins.py)."""
    with open(PINS_PATH) as fh:
        return json.load(fh)
