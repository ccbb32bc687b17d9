"""Machine-checking the generated viewer JavaScript (VERDICT r4 #7).

No JS runtime exists in this image; ``utils/jscheck.py`` is the
ES-lexer + bracket-pairing validator that must fail on any injected
whole-file-fatal syntax error in the emitted script — and pass on the
real exported viewer, including through ``export_html`` itself (which
now runs the check on every export).
"""

import re

import numpy as np
import pytest

from lidar_transfer_tpu import webviewer
from lidar_transfer_tpu.utils.jscheck import (JsSyntaxError, check_js,
                                              tokenize_js)


# ---------------------------------------------------------------- lexer unit

def test_tokenize_basic_constructs():
    toks = tokenize_js(
        'const x = "a\\"b" + `t${1 + {a: [2]}.a}u` + 0.5e-3; // c\n'
        "/* block\ncomment */ let re = /a[/]b/gi; y /= 2;")
    kinds = [k for k, *_ in toks]
    assert "string" in kinds and "template" in kinds and "regex" in kinds
    # the template's ${} substitution is lexed as real code tokens
    assert any(v == "a" for k, v, *_ in toks if k == "ident")


def test_division_vs_regex_heuristic():
    # after ) ] } number ident: division — must not swallow the rest
    toks = tokenize_js("a = (1 + 2) / 3 / b[0] / 4;")
    assert not any(k == "regex" for k, *_ in toks)
    # after = ( , return: regex
    toks = tokenize_js("a = /x/; f(/y/, 1); return /z/;")
    assert sum(k == "regex" for k, *_ in toks) == 3


@pytest.mark.parametrize("bad,msg", [
    ('const s = "unterminated', "unterminated string"),
    ('const s = "raw\nnewline"', "raw newline"),
    ("const t = `open ${1 + 2", "unclosed"),
    ("const t = `never closed", "unterminated template"),
    ("/* never closed", "unterminated block comment"),
    ("const r = /never closed", "unterminated regex"),
    ("function f() { if (x) { y(); }", "unclosed"),
    ("const a = [1, 2);", "mismatched"),
    ("const a = 1); ", "unmatched"),
    ("const a = 1 # 2;", "unexpected character"),
    ("", "no code"),
])
def test_lexical_errors_raise(bad, msg):
    with pytest.raises(JsSyntaxError, match=msg):
        check_js(bad)


def test_required_idents_golden_structure():
    check_js("function render() {} render();",
             required_idents=("render",))
    with pytest.raises(JsSyntaxError, match="missing"):
        check_js("function render() {}", required_idents=("viewer",))


# ------------------------------------------------- the real emitted script

def _real_script(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    payload = {"rows": [("r", np.zeros((4, 8, 3), np.uint8))],
               "points_3d": pts, "colors_3d": np.ones((50, 3)),
               "title": "t"}
    out = webviewer.export_html([("f", payload)],
                                str(tmp_path / "v.html"))
    with open(out, encoding="utf-8") as f:
        return webviewer.extract_script(f.read())


def test_real_viewer_script_passes(tmp_path):
    script = _real_script(tmp_path)
    n = check_js(script, required_idents=(
        "viewer", "render", "refresh2d", "perspective", "lookAt",
        "drawCloud", "buffersFor", "FRAMES", "TITLE"))
    assert n > 1000  # the full viewer, not a stub


def test_injected_syntax_errors_fail(tmp_path):
    """THE VERDICT-r4 #7 contract: every injected whole-file-fatal
    regression class in the REAL template output must be caught."""
    script = _real_script(tmp_path)
    # 1. dropped closing brace (classic template edit regression)
    broken = script[:script.rfind("}")] + script[script.rfind("}") + 1:]
    with pytest.raises(JsSyntaxError):
        check_js(broken)
    # 2. broken string quote
    broken = script.replace('"keydown"', '"keydown', 1)
    assert broken != script
    with pytest.raises(JsSyntaxError):
        check_js(broken)
    # 3. unterminated template literal (shader source)
    broken = script.replace("`;", ";", 1)
    assert broken != script
    with pytest.raises(JsSyntaxError):
        check_js(broken)
    # 4. stray ${ opened but never closed
    broken = script.replace('"use strict";', '"use strict"; const z = `${;',
                            1)
    with pytest.raises(JsSyntaxError):
        check_js(broken)
    # 5. a renamed load-bearing symbol trips the golden-structure check
    broken = re.sub(r"\brender\b", "renamed", script)
    assert broken != script
    with pytest.raises(JsSyntaxError, match="missing"):
        check_js(broken, required_idents=("render",))


def test_export_html_rejects_template_regression(tmp_path, monkeypatch):
    """export_html itself must refuse to write a page whose script
    cannot parse (the check is wired into the production path)."""
    broken = webviewer._HTML_TEMPLATE.replace("function render() {",
                                              "function render() {{", 1)
    monkeypatch.setattr(webviewer, "_HTML_TEMPLATE", broken)
    payload = {"rows": [("r", np.zeros((2, 2, 3), np.uint8))],
               "points_3d": np.zeros((3, 3), np.float32),
               "colors_3d": np.ones((3, 3))}
    with pytest.raises(JsSyntaxError):
        webviewer.export_html([("f", payload)], str(tmp_path / "x.html"))


def test_template_has_single_script_block():
    assert webviewer._HTML_TEMPLATE.count("<script>") == 1
    # extract_script rejects malformed docs
    with pytest.raises(ValueError):
        webviewer.extract_script("<html>no script</html>")


def test_lexer_total_on_random_input():
    """Robustness: on arbitrary garbage the lexer must either tokenize
    or raise JsSyntaxError — never hang, loop, or raise anything else
    (it runs inside export_html's production path)."""
    import random

    rng = random.Random(42)
    alphabet = "abz019 \n\t(){}[]'\"`$/\\*+-=<>!&|?:;,.#~^%"
    for _ in range(300):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 120)))
        try:
            tokenize_js(s)
        except JsSyntaxError:
            pass


def test_lexer_progress_on_pathological_nesting():
    # deep template/expression nesting must terminate and balance
    src = "const x = " + "`${" * 50 + "1" + "}`" * 50 + ";"
    toks = tokenize_js(src)
    assert any(k == "number" for k, *_ in toks)
    with pytest.raises(JsSyntaxError):
        tokenize_js("const x = " + "`${" * 50 + "1" + "}`" * 49)
