"""Locale auto-detection + string maps (reference i18n/i18n.py:13 `I18nAuto`).

Locale JSONs live in tpu_rvc/assets/i18n/<lang>.json as {key: translation}.
Missing keys fall through to the key itself, so the default language (en_US)
needs no file.
"""

from __future__ import annotations

import json
import locale
import os
from pathlib import Path
from typing import Dict, Optional

LOCALE_DIR = Path(__file__).parent.parent / "assets" / "i18n"


def load_language_list(language: str) -> Dict[str, str]:
    path = LOCALE_DIR / f"{language}.json"
    if not path.exists():
        return {}
    return json.loads(path.read_text())


class I18nAuto:
    def __init__(self, language: Optional[str] = None):
        if language in (None, "Auto", "auto"):
            language = locale.getdefaultlocale()[0] or "en_US"
        if not (LOCALE_DIR / f"{language}.json").exists():
            language = "en_US"
        self.language = language
        self.language_map = load_language_list(language)

    def __call__(self, key: str) -> str:
        return self.language_map.get(key, key)

    def __repr__(self):
        return f"Use Language: {self.language}"


def scan_i18n_keys(source_dir: str) -> set:
    """Collect i18n("...") keys from sources (reference scan_i18n.py role)."""
    import ast

    keys = set()
    for root, _, files in os.walk(source_dir):
        for f in files:
            if not f.endswith(".py"):
                continue
            try:
                tree = ast.parse(open(os.path.join(root, f)).read())
            except SyntaxError:
                continue
            for node in ast.walk(tree):
                if (isinstance(node, ast.Call)
                        and isinstance(node.func, ast.Name)
                        and node.func.id == "i18n"
                        and node.args
                        and isinstance(node.args[0], ast.Constant)):
                    keys.add(node.args[0].value)
    return keys
