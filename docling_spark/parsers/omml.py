r"""OMML (Office Math Markup) → LaTeX, stdlib-only.

Clean-room implementation of the conversion the reference performs with
its dwml-derived module + pylatexenc
(/root/reference/docling/backend/docx/latex/omml.py): an ``m:oMath``
element tree walks to a LaTeX string. Output conventions (pinned by the
``equations.docx`` groundtruth):

* math-symbol characters render as `` \cmd `` (single space on both
  sides): ``π`` → `` \pi ``, ``∞`` → `` \infty ``
* text-mode symbol characters render wrapped: ``×`` →
  `` \text{ \texttimes } ``
* literal LaTeX-special characters in run text are backslash-escaped
* constructs: fractions ``\frac{..}{..}`` (noBar → ``\genfrac``),
  delimiters ``\left(..\right)``, sub/superscripts ``_{..}``/``^{..}``,
  n-ary ``\sum_{..}^{..}``, functions ``\cos(..)``, radicals
  ``\sqrt[..]{..}``, accents, under/over-braces, eqArr/matrix rows

Runs inside Arrow-batched UDF workers (no deps beyond xml.etree).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, Optional

MNS = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"

# characters that must be escaped when they appear literally in run text
_LATEX_SPECIALS = set("{}_^#&$%~")

# math-mode commands:  char -> command name (rendered " \name ")
_MATH_CMD: Dict[str, str] = {
    # Greek (actual Greek block)
    "α": "alpha", "β": "beta", "γ": "gamma", "δ": "delta",
    "ε": "epsilon", "ζ": "zeta", "η": "eta", "θ": "theta",
    "ι": "iota", "κ": "kappa", "λ": "lambda", "μ": "mu",
    "ν": "nu", "ξ": "xi", "π": "pi", "ρ": "rho",
    "ς": "varsigma", "σ": "sigma", "τ": "tau", "υ": "upsilon",
    "φ": "phi", "χ": "chi", "ψ": "psi", "ω": "omega",
    "Γ": "Gamma", "Δ": "Delta", "Θ": "Theta", "Λ": "Lambda",
    "Ξ": "Xi", "Π": "Pi", "Σ": "Sigma", "Υ": "Upsilon",
    "Φ": "Phi", "Ψ": "Psi", "Ω": "Omega",
    # ordinary / relation / binary symbols
    "∞": "infty", "±": "pm", "∓": "mp", "≤": "leq", "≥": "geq",
    "≠": "ne", "≈": "approx", "≡": "equiv", "∼": "sim",
    "∈": "in", "∉": "notin", "∋": "ni", "⊂": "subset",
    "⊆": "subseteq", "⊃": "supset", "⊇": "supseteq",
    "∪": "cup", "∩": "cap", "∅": "emptyset",
    "∂": "partial", "∇": "nabla", "∀": "forall", "∃": "exists",
    "¬": "neg", "∧": "wedge", "∨": "vee",
    "⋅": "cdot", "∘": "circ", "⊕": "oplus", "⊗": "otimes",
    "⋯": "cdots", "⋮": "vdots", "⋱": "ddots", "ℏ": "hbar",
    "ℓ": "ell", "ℜ": "Re", "ℑ": "Im", "ℵ": "aleph",
    "→": "rightarrow", "←": "leftarrow", "↔": "leftrightarrow",
    "⇒": "Rightarrow", "⇐": "Leftarrow", "⇔": "Leftrightarrow",
    "↑": "uparrow", "↓": "downarrow", "↦": "mapsto",
    "′": "prime", "∝": "propto", "∠": "angle", "⊥": "perp",
    "∥": "parallel", "∴": "therefore", "∵": "because",
}

# text-mode commands:  char -> command name (rendered " \text{ \name } ")
_TEXT_CMD: Dict[str, str] = {
    "×": "texttimes", "÷": "textdiv", "…": "textellipsis",
    "°": "textdegree", "§": "textsection", "¶": "textparagraph",
    "†": "textdagger", "‡": "textdaggerdbl", "•": "textbullet",
    "–": "textendash", "—": "textemdash", "£": "textsterling",
    "¥": "textyen", "€": "texteuro", "©": "textcopyright",
    "®": "textregistered", "™": "texttrademark",
}

# n-ary big operators:  m:naryPr chr attribute -> command
_BIG_OP: Dict[str, str] = {
    "∑": "\\sum", "∏": "\\prod", "∐": "\\coprod", "∫": "\\int",
    "∬": "\\iint", "∭": "\\iiint", "∮": "\\oint",
    "⋀": "\\bigwedge", "⋁": "\\bigvee", "⋂": "\\bigcap",
    "⋃": "\\bigcup", "⨀": "\\bigodot", "⨁": "\\bigoplus",
    "⨂": "\\bigotimes",
}

_FUNC_NAMES = {"sin", "cos", "tan", "arcsin", "arccos", "arctan",
               "arccot", "sinh", "cosh", "tanh", "coth", "sec", "csc"}

_ACCENTS: Dict[str, str] = {
    "̂": "\\hat{%s}", "̃": "\\tilde{%s}",
    "̄": "\\bar{%s}", "̇": "\\dot{%s}",
    "̈": "\\ddot{%s}", "⃗": "\\vec{%s}",
    "́": "\\acute{%s}", "̀": "\\grave{%s}",
    "̆": "\\breve{%s}", "̌": "\\check{%s}",
}

_GROUP_CHARS: Dict[str, str] = {
    "⏟": "\\underbrace{%s}", "⏞": "\\overbrace{%s}",
    "⎵": "\\underbracket{%s}", "⎴": "\\overbracket{%s}",
}


def _math_alpha(c: str) -> Optional[str]:
    """Mathematical-italic alphanumerics fold back to ASCII."""
    cp = ord(c)
    if 0x1D434 <= cp <= 0x1D44D:
        return chr(ord("A") + cp - 0x1D434)
    if 0x1D44E <= cp <= 0x1D467:
        return chr(ord("a") + cp - 0x1D44E)
    if cp == 0x210E:  # italic h carve-out
        return "h"
    return None


# characters that keep their literal form but gain math-mode padding
# (the reference's \ensuremath unwrap yields " < " etc.)
_PADDED_LITERAL = {"<", ">"}


def _render_char(c: str) -> str:
    # Spacing model (golden-pinned): math commands carry TWO spaces per
    # side, text commands and padded literals ONE; the final single
    # global "  "→" " pass (see omml_to_latex) then collapses runs, so
    # a math command next to a literal space keeps one separating space
    # while command-only neighborhoods tighten fully.
    cmd = _MATH_CMD.get(c)
    if cmd is not None:
        return f"  \\{cmd}  "
    tcmd = _TEXT_CMD.get(c)
    if tcmd is not None:
        return f" \\text{{ \\{tcmd} }} "
    if c in _PADDED_LITERAL:
        return f" {c} "
    if c in _LATEX_SPECIALS:
        return "\\" + c
    alpha = _math_alpha(c)
    return alpha if alpha is not None else c


def _tag(e: ET.Element) -> str:
    return e.tag[len(MNS):] if e.tag.startswith(MNS) else e.tag


def _val(parent: Optional[ET.Element], name: str) -> Optional[str]:
    if parent is None:
        return None
    el = parent.find(f"{MNS}{name}")
    if el is None:
        return None
    return el.get(f"{MNS}val")


class _Converter:
    """One m:oMath (or oMathPara) element → LaTeX string."""

    def convert(self, root: ET.Element) -> str:
        return self._children(root)

    # ---- generic walk ----------------------------------------------------

    def _children(self, e: ET.Element) -> str:
        return "".join(
            filter(None, (self._element(c) for c in e
                          if c.tag.startswith(MNS))))

    def _element(self, e: ET.Element) -> Optional[str]:
        handler = getattr(self, "_do_" + _tag(e).lower(), None)
        if handler is not None:
            return handler(e)
        if _tag(e).endswith("Pr"):
            return None  # property containers carry no content
        return self._children(e)  # transparent containers (box, e, …)

    def _part(self, e: ET.Element, name: str) -> str:
        el = e.find(f"{MNS}{name}")
        return self._children(el) if el is not None else ""

    # ---- leaves ----------------------------------------------------------

    def _do_r(self, e: ET.Element) -> str:
        out = []
        for t in e.findall(f"{MNS}t"):
            for c in t.text or "":
                out.append(_render_char(c))
        return "".join(out)

    def _do_t(self, e: ET.Element) -> str:
        return "".join(_render_char(c) for c in e.text or "")

    # ---- constructs ------------------------------------------------------

    def _do_f(self, e: ET.Element) -> str:
        kind = _val(e.find(f"{MNS}fPr"), "type") or "bar"
        num = self._part(e, "num")
        den = self._part(e, "den")
        if kind == "noBar":
            return f"\\genfrac{{}}{{}}{{0pt}}{{}}{{{num}}}{{{den}}}"
        if kind == "lin":
            return f"{{{num}}}/{{{den}}}"
        if kind == "skw":
            return f"^{{{num}}}/_{{{den}}}"
        return f"\\frac{{{num}}}{{{den}}}"

    def _do_d(self, e: ET.Element) -> str:
        pr = e.find(f"{MNS}dPr")
        beg = _val(pr, "begChr")
        end = _val(pr, "endChr")
        left = "(" if beg is None else (beg or ".")
        right = ")" if end is None else (end or ".")
        body = "".join(self._children(c) for c in e.findall(f"{MNS}e"))
        return f"\\left{left}{body}\\right{right}"

    def _do_ssub(self, e: ET.Element) -> str:
        return self._part(e, "e") + f"_{{{self._part(e, 'sub')}}}"

    def _do_ssup(self, e: ET.Element) -> str:
        return self._part(e, "e") + f"^{{{self._part(e, 'sup')}}}"

    def _do_ssubsup(self, e: ET.Element) -> str:
        return (self._part(e, "e")
                + f"_{{{self._part(e, 'sub')}}}"
                + f"^{{{self._part(e, 'sup')}}}")

    def _do_spre(self, e: ET.Element) -> str:
        return (f"_{{{self._part(e, 'sub')}}}"
                + f"^{{{self._part(e, 'sup')}}}" + self._part(e, "e"))

    def _do_nary(self, e: ET.Element) -> str:
        chr_attr = _val(e.find(f"{MNS}naryPr"), "chr")
        op = _BIG_OP.get(chr_attr, "\\int") if chr_attr else "\\int"
        parts = []
        sub = e.find(f"{MNS}sub")
        sup = e.find(f"{MNS}sup")
        if sub is not None:
            parts.append(f"_{{{self._children(sub)}}}")
        if sup is not None:
            parts.append(f"^{{{self._children(sup)}}}")
        parts.append(self._part(e, "e"))
        return op + "".join(parts)

    def _do_func(self, e: ET.Element) -> str:
        fname = e.find(f"{MNS}fName")
        arg = self._part(e, "e")
        name = "".join((t.text or "") for t in
                       fname.iter(f"{MNS}t")) if fname is not None else ""
        if name in _FUNC_NAMES:
            return f"\\{name}({arg})"
        # unstructured name (e.g. a limLow rendering) — concatenate
        rendered = self._children(fname) if fname is not None else ""
        return rendered + arg

    def _do_rad(self, e: ET.Element) -> str:
        deg = self._part(e, "deg")
        body = self._part(e, "e")
        return f"\\sqrt[{deg}]{{{body}}}" if deg else f"\\sqrt{{{body}}}"

    def _do_acc(self, e: ET.Element) -> str:
        chr_attr = _val(e.find(f"{MNS}accPr"), "chr")
        template = _ACCENTS.get(chr_attr or "̂", "\\hat{%s}")
        return template % self._part(e, "e")

    def _do_bar(self, e: ET.Element) -> str:
        pos = _val(e.find(f"{MNS}barPr"), "pos")
        template = "\\underline{%s}" if pos == "bot" else "\\overline{%s}"
        return template % self._part(e, "e")

    def _do_groupchr(self, e: ET.Element) -> str:
        chr_attr = _val(e.find(f"{MNS}groupChrPr"), "chr")
        template = _GROUP_CHARS.get(chr_attr or "⏟", "\\underbrace{%s}")
        return template % self._part(e, "e")

    def _do_eqarr(self, e: ET.Element) -> str:
        return "\\\\".join(self._children(c)
                           for c in e.findall(f"{MNS}e"))

    def _do_limlow(self, e: ET.Element) -> str:
        base = self._part(e, "e")
        lim = self._part(e, "lim").replace("\\rightarrow", "\\to")
        if base.strip() in ("lim", "max", "min"):
            return f"\\{base.strip()}_{{{lim}}}"
        return f"{base}_{{{lim}}}"

    def _do_limupp(self, e: ET.Element) -> str:
        base = self._part(e, "e")
        lim = self._part(e, "lim").replace("\\rightarrow", "\\to")
        return f"\\overset{{{lim}}}{{{base}}}"

    def _do_m(self, e: ET.Element) -> str:
        rows = ["&".join(self._children(c) for c in mr.findall(f"{MNS}e"))
                for mr in e.findall(f"{MNS}mr")]
        return "\\begin{matrix}" + "\\\\".join(rows) + "\\end{matrix}"


def omml_to_latex(omath: ET.Element) -> str:
    """Convert one ``m:oMath`` (or ``m:oMathPara``) element to LaTeX.

    The single double-space collapse mirrors the reference's final
    ``str()`` normalization (omml.py:192): non-overlapping "  "→" ",
    so triple runs intentionally survive as doubles (golden-pinned)."""
    return _Converter().convert(omath).replace("  ", " ")
