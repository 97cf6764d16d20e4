"""Greek stemmer — analysis/el/GreekStemmer.java (Ntais, *Development of a
Stemmer for the Greek Language*, with the Lucene implementation's rule set
and exception lists).

Input contract matches GreekStemFilter: casefolded Greek with final sigma
folded to σ and diacritics removed (``filters.greek_lowercase``).  All 343
reference TestGreekStemmer goldens are asserted in tests/test_el.py.

The reference "removes" a suffix by shortening a length field over an
unchanged buffer, so "add back -αδ" re-exposes buffer characters; a few
rules overwrite buffer characters outright.  ``_G`` mirrors that state.
"""

from __future__ import annotations

__all__ = ["greek_stem", "greek_analyzer"]

_VOWELS = "αεηιουω"
_VOWELS_NO_Y = "αεηιοω"  # endsWithVowelNoY: υ excluded

_EXC4 = {"θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"}
_EXC6 = {"αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ",
         "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ",
         "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ",
         "πετσ", "πιτσ", "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ",
         "συναδ", "τσαμ", "υποδ", "φιλον", "φυλοδ", "χασ"}
_EXC7 = {"αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ",
         "πικρ", "ποτ", "σιχ", "χ"}
_EXC8A = {"τρ", "τσ"}
_EXC8B = {"βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
          "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν",
          "ουλ", "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ",
          "σουλτ", "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ",
          "ψυχοπλ", "αγ", "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ",
          "πιθ", "πουριτ", "σ", "ζωντ", "ικ", "καστ", "κοπ", "λιχ",
          "λουθηρ", "μαιντ", "μελ", "σιγ", "σπ", "στεγ", "τραγ", "τσαγ",
          "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ",
          "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ",
          "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ", "καταγαλ",
          "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ", "νταβ",
          "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ", "περιτρ",
          "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ",
          "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"}
_EXC9 = {"αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
         "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ",
         "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"}
_EXC12A = {"π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"}
_EXC12B = {"αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"}
_EXC13 = {"διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"}
_EXC14 = {"φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ",
          "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ",
          "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ",
          "καθαρευ", "πλε", "τσα"}
_EXC15A = {"αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
           "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν",
           "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ",
           "προσωποπ", "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ",
           "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ", "εν", "επιτ",
           "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ",
           "μ"}
_EXC15B = {"ψοφ", "ναυλοχ"}
_EXC16 = {"ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"}
_EXC17 = {"ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
          "κοινοχρ", "παλιμψ"}
_EXC18 = {"ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"}
_EXC19 = {"παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"}


class _G:
    """Stemming state: the char buffer (never shrinks — 'removing' a
    suffix just lowers ``n``, so add-backs re-expose buffer chars) and the
    live length ``n``."""

    __slots__ = ("b", "n")

    def __init__(self, word: str):
        self.b = list(word)
        self.n = len(word)

    def ends(self, suf: str) -> bool:
        ln = len(suf)
        if ln > self.n:
            return False
        return "".join(self.b[self.n - ln:self.n]) == suf

    def stem(self) -> str:
        return "".join(self.b[:self.n])

    def vowel(self) -> bool:
        return self.n > 0 and self.b[self.n - 1] in _VOWELS

    def vowel_no_y(self) -> bool:
        return self.n > 0 and self.b[self.n - 1] in _VOWELS_NO_Y

    def put(self, s: str):
        """Overwrite the last len(s) live chars (reference's explicit
        add-back writes)."""
        for i, c in enumerate(s):
            self.b[self.n - len(s) + i] = c


def greek_stem(word: str) -> str:
    if len(word) < 4:
        return word
    g = _G(word)
    orig = g.n

    _rule0(g); _rule1(g); _rule2(g); _rule3(g); _rule4(g); _rule5(g)
    _rule6(g); _rule7(g); _rule8(g); _rule9(g); _rule10(g); _rule11(g)
    _rule12(g); _rule13(g); _rule14(g); _rule15(g); _rule16(g); _rule17(g)
    _rule18(g); _rule19(g); _rule20(g)
    if g.n == orig:
        _rule21(g)
    _rule22(g)
    return g.stem()


def _rule0(g):
    n = g.n
    if n > 9 and (g.ends("καθεστωτοσ") or g.ends("καθεστωτων")):
        g.n -= 4; return
    if n > 8 and (g.ends("γεγονοτοσ") or g.ends("γεγονοτων")):
        g.n -= 4; return
    if n > 8 and g.ends("καθεστωτα"):
        g.n -= 3; return
    if n > 7 and (g.ends("τατογιου") or g.ends("τατογιων")):
        g.n -= 4; return
    if n > 7 and g.ends("γεγονοτα"):
        g.n -= 3; return
    if n > 7 and g.ends("καθεστωσ"):
        g.n -= 2; return
    # reference quirk: the len guard binds only to the first alternative
    if (n > 6 and g.ends("σκαγιου")) or g.ends("σκαγιων") \
            or g.ends("ολογιου") or g.ends("ολογιων") or g.ends("κρεατοσ") \
            or g.ends("κρεατων") or g.ends("περατοσ") or g.ends("περατων") \
            or g.ends("τερατοσ") or g.ends("τερατων"):
        g.n -= 4; return
    if n > 6 and g.ends("τατογια"):
        g.n -= 3; return
    if n > 6 and g.ends("γεγονοσ"):
        g.n -= 2; return
    if n > 5 and (g.ends("φαγιου") or g.ends("φαγιων")
                  or g.ends("σογιου") or g.ends("σογιων")):
        g.n -= 4; return
    if n > 5 and (g.ends("σκαγια") or g.ends("ολογια") or g.ends("κρεατα")
                  or g.ends("περατα") or g.ends("τερατα")):
        g.n -= 3; return
    if n > 4 and (g.ends("φαγια") or g.ends("σογια")
                  or g.ends("φωτοσ") or g.ends("φωτων")):
        g.n -= 3; return
    if n > 4 and (g.ends("κρεασ") or g.ends("περασ") or g.ends("τερασ")):
        g.n -= 2; return
    if n > 3 and g.ends("φωτα"):
        g.n -= 2; return
    if n > 2 and g.ends("φωσ"):
        g.n -= 1; return


def _rule1(g):
    if g.n > 4 and (g.ends("αδεσ") or g.ends("αδων")):
        g.n -= 4
        if not (g.ends("οκ") or g.ends("μαμ") or g.ends("μαν")
                or g.ends("μπαμπ") or g.ends("πατερ") or g.ends("γιαγι")
                or g.ends("νταντ") or g.ends("κυρ") or g.ends("θει")
                or g.ends("πεθερ")):
            g.n += 2  # add back -αδ


def _rule2(g):
    if g.n > 4 and (g.ends("εδεσ") or g.ends("εδων")):
        g.n -= 4
        if g.ends("οπ") or g.ends("ιπ") or g.ends("εμπ") or g.ends("υπ") \
                or g.ends("γηπ") or g.ends("δαπ") or g.ends("κρασπ") \
                or g.ends("μιλ"):
            g.n += 2  # add back -εδ


def _rule3(g):
    if g.n > 5 and (g.ends("ουδεσ") or g.ends("ουδων")):
        g.n -= 5
        if g.ends("αρκ") or g.ends("καλιακ") or g.ends("πεταλ") \
                or g.ends("λιχ") or g.ends("πλεξ") or g.ends("σκ") \
                or g.ends("σ") or g.ends("φλ") or g.ends("φρ") \
                or g.ends("βελ") or g.ends("λουλ") or g.ends("χν") \
                or g.ends("σπ") or g.ends("τραγ") or g.ends("φε"):
            g.n += 3  # add back -ουδ


def _rule4(g):
    if g.n > 3 and (g.ends("εωσ") or g.ends("εων")):
        g.n -= 3
        if g.stem() in _EXC4:
            g.n += 1  # add back -ε


def _rule5(g):
    if g.n > 2 and g.ends("ια"):
        g.n -= 2
        if g.vowel():
            g.n += 1  # add back -ι
    elif g.n > 3 and (g.ends("ιου") or g.ends("ιων")):
        g.n -= 3
        if g.vowel():
            g.n += 1


def _rule6(g):
    removed = False
    if g.n > 3 and (g.ends("ικα") or g.ends("ικο")):
        g.n -= 3
        removed = True
    elif g.n > 4 and (g.ends("ικου") or g.ends("ικων")):
        g.n -= 4
        removed = True
    if removed and (g.vowel() or g.stem() in _EXC6):
        g.n += 2  # add back -ικ


def _rule7(g):
    if g.n == 5 and g.ends("αγαμε"):
        g.n -= 1
        return
    if g.n > 7 and g.ends("ηθηκαμε"):
        g.n -= 7
    elif g.n > 6 and g.ends("ουσαμε"):
        g.n -= 6
    elif g.n > 5 and (g.ends("αγαμε") or g.ends("ησαμε")
                      or g.ends("ηκαμε")):
        g.n -= 5
    if g.n > 3 and g.ends("αμε"):
        g.n -= 3
        if g.stem() in _EXC7:
            g.n += 2  # add back -αμ


def _rule8(g):
    removed = False
    if g.n > 8 and g.ends("ιουντανε"):
        g.n -= 8
        removed = True
    elif (g.n > 7 and g.ends("ιοντανε")) or g.ends("ουντανε") \
            or g.ends("ηθηκανε"):  # reference quirk: guard on first only
        g.n -= 7
        removed = True
    elif (g.n > 6 and g.ends("ιοτανε")) or g.ends("οντανε") \
            or g.ends("ουσανε"):
        g.n -= 6
        removed = True
    elif (g.n > 5 and g.ends("αγανε")) or g.ends("ησανε") \
            or g.ends("οτανε") or g.ends("ηκανε"):
        g.n -= 5
        removed = True
    if removed and g.stem() in _EXC8A:
        g.n += 4
        g.put("αγαν")
    if g.n > 3 and g.ends("ανε"):
        g.n -= 3
        if g.vowel_no_y() or g.stem() in _EXC8B:
            g.n += 2  # add back -αν


def _rule9(g):
    if g.n > 5 and g.ends("ησετε"):
        g.n -= 5
    if g.n > 3 and g.ends("ετε"):
        g.n -= 3
        if g.stem() in _EXC9 or g.vowel_no_y() or g.ends("οδ") \
                or g.ends("αιρ") or g.ends("φορ") or g.ends("ταθ") \
                or g.ends("διαθ") or g.ends("σχ") or g.ends("ενδ") \
                or g.ends("ευρ") or g.ends("τιθ") or g.ends("υπερθ") \
                or g.ends("ραθ") or g.ends("ενθ") or g.ends("ροθ") \
                or g.ends("σθ") or g.ends("πυρ") or g.ends("αιν") \
                or g.ends("συνδ") or g.ends("συν") or g.ends("συνθ") \
                or g.ends("χωρ") or g.ends("πον") or g.ends("βρ") \
                or g.ends("καθ") or g.ends("ευθ") or g.ends("εκθ") \
                or g.ends("νετ") or g.ends("ρον") or g.ends("αρκ") \
                or g.ends("βαρ") or g.ends("βολ") or g.ends("ωφελ"):
            g.n += 2  # add back -ετ


def _rule10(g):
    if g.n > 5 and (g.ends("οντασ") or g.ends("ωντασ")):
        g.n -= 5
        if g.n == 3 and g.ends("αρχ"):
            g.n += 3  # add back *ντ as οντ
            g.put("οντ")
        if g.ends("κρε"):
            g.n += 3  # add back *ντ as ωντ
            g.put("ωντ")


def _rule11(g):
    if g.n > 6 and g.ends("ομαστε"):
        g.n -= 6
        if g.n == 2 and g.ends("ον"):
            g.n += 5  # add back -ομαστ
    elif g.n > 7 and g.ends("ιομαστε"):
        g.n -= 7
        if g.n == 2 and g.ends("ον"):
            g.n += 5
            g.put("ομαστ")


def _rule12(g):
    if g.n > 5 and g.ends("ιεστε"):
        g.n -= 5
        if g.stem() in _EXC12A:
            g.n += 4  # add back -ιεστ
    if g.n > 4 and g.ends("εστε"):
        g.n -= 4
        if g.stem() in _EXC12B:
            g.n += 3  # add back -εστ


def _rule13(g):
    if g.n > 6 and g.ends("ηθηκεσ"):
        g.n -= 6
    elif g.n > 5 and (g.ends("ηθηκα") or g.ends("ηθηκε")):
        g.n -= 5
    removed = False
    if g.n > 4 and g.ends("ηκεσ"):
        g.n -= 4
        removed = True
    elif g.n > 3 and (g.ends("ηκα") or g.ends("ηκε")):
        g.n -= 3
        removed = True
    if removed and (g.stem() in _EXC13 or g.ends("σκωλ")
                    or g.ends("σκουλ") or g.ends("ναρθ") or g.ends("σφ")
                    or g.ends("οθ") or g.ends("πιθ")):
        g.n += 2  # add back -ηκ


def _rule14(g):
    removed = False
    if g.n > 5 and g.ends("ουσεσ"):
        g.n -= 5
        removed = True
    elif g.n > 4 and (g.ends("ουσα") or g.ends("ουσε")):
        g.n -= 4
        removed = True
    if removed and (g.stem() in _EXC14 or g.vowel() or g.ends("ποδαρ")
                    or g.ends("βλεπ") or g.ends("πανταχ")
                    or g.ends("φρυδ") or g.ends("μαντιλ")
                    or g.ends("μαλλ") or g.ends("κυματ") or g.ends("λαχ")
                    or g.ends("ληγ") or g.ends("φαγ") or g.ends("ομ")
                    or g.ends("πρωτ")):
        g.n += 3  # add back -ουσ


def _rule15(g):
    removed = False
    if g.n > 4 and g.ends("αγεσ"):
        g.n -= 4
        removed = True
    elif g.n > 3 and (g.ends("αγα") or g.ends("αγε")):
        g.n -= 3
        removed = True
    if removed:
        cond1 = (g.stem() in _EXC15A or g.ends("οφ") or g.ends("πελ")
                 or g.ends("χορτ") or g.ends("λλ") or g.ends("σφ")
                 or g.ends("ρπ") or g.ends("φρ") or g.ends("πρ")
                 or g.ends("λοχ") or g.ends("σμην"))
        cond2 = g.stem() in _EXC15B or g.ends("κολλ")
        if cond1 and not cond2:
            g.n += 2  # add back -αγ


def _rule16(g):
    removed = False
    if g.n > 4 and g.ends("ησου"):
        g.n -= 4
        removed = True
    elif g.n > 3 and (g.ends("ησε") or g.ends("ησα")):
        g.n -= 3
        removed = True
    if removed and g.stem() in _EXC16:
        g.n += 2  # add back -ησ


def _rule17(g):
    if g.n > 4 and g.ends("ηστε"):
        g.n -= 4
        if g.stem() in _EXC17:
            g.n += 3  # add back -ηστ


def _rule18(g):
    removed = False
    if g.n > 6 and (g.ends("ησουνε") or g.ends("ηθουνε")):
        g.n -= 6
        removed = True
    elif g.n > 4 and g.ends("ουνε"):
        g.n -= 4
        removed = True
    if removed and g.stem() in _EXC18:
        g.n += 3
        g.put("ουν")


def _rule19(g):
    removed = False
    if g.n > 6 and (g.ends("ησουμε") or g.ends("ηθουμε")):
        g.n -= 6
        removed = True
    elif g.n > 4 and g.ends("ουμε"):
        g.n -= 4
        removed = True
    if removed and g.stem() in _EXC19:
        g.n += 3
        g.put("ουμ")


def _rule20(g):
    if g.n > 5 and (g.ends("ματων") or g.ends("ματοσ")):
        g.n -= 3
    elif g.n > 4 and g.ends("ματα"):
        g.n -= 2


def _rule21(g):
    n = g.n
    if n > 9 and g.ends("ιοντουσαν"):
        g.n -= 9; return
    if n > 8 and (g.ends("ιομασταν") or g.ends("ιοσασταν")
                  or g.ends("ιουμαστε") or g.ends("οντουσαν")):
        g.n -= 8; return
    if n > 7 and (g.ends("ιεμαστε") or g.ends("ιεσαστε")
                  or g.ends("ιομουνα") or g.ends("ιοσαστε")
                  or g.ends("ιοσουνα") or g.ends("ιουνται")
                  or g.ends("ιουνταν") or g.ends("ηθηκατε")
                  or g.ends("ομασταν") or g.ends("οσασταν")
                  or g.ends("ουμαστε")):
        g.n -= 7; return
    if n > 6 and (g.ends("ιομουν") or g.ends("ιονταν") or g.ends("ιοσουν")
                  or g.ends("ηθειτε") or g.ends("ηθηκαν")
                  or g.ends("ομουνα") or g.ends("οσαστε")
                  or g.ends("οσουνα") or g.ends("ουνται")
                  or g.ends("ουνταν") or g.ends("ουσατε")):
        g.n -= 6; return
    if n > 5 and (g.ends("αγατε") or g.ends("ιεμαι") or g.ends("ιεται")
                  or g.ends("ιεσαι") or g.ends("ιοταν") or g.ends("ιουμα")
                  or g.ends("ηθεισ") or g.ends("ηθουν") or g.ends("ηκατε")
                  or g.ends("ησατε") or g.ends("ησουν") or g.ends("ομουν")
                  or g.ends("ονται") or g.ends("ονταν") or g.ends("οσουν")
                  or g.ends("ουμαι") or g.ends("ουσαν")):
        g.n -= 5; return
    if n > 4 and (g.ends("αγαν") or g.ends("αμαι") or g.ends("ασαι")
                  or g.ends("αται") or g.ends("ειτε") or g.ends("εσαι")
                  or g.ends("εται") or g.ends("ηδεσ") or g.ends("ηδων")
                  or g.ends("ηθει") or g.ends("ηκαν") or g.ends("ησαν")
                  or g.ends("ησει") or g.ends("ησεσ") or g.ends("ομαι")
                  or g.ends("οταν")):
        g.n -= 4; return
    if n > 3 and (g.ends("αει") or g.ends("εισ") or g.ends("ηθω")
                  or g.ends("ησω") or g.ends("ουν") or g.ends("ουσ")):
        g.n -= 3; return
    if n > 2 and (g.ends("αν") or g.ends("ασ") or g.ends("αω")
                  or g.ends("ει") or g.ends("εσ") or g.ends("ησ")
                  or g.ends("οι") or g.ends("οσ") or g.ends("ου")
                  or g.ends("υσ") or g.ends("ων")):
        g.n -= 2; return
    if n > 1 and g.vowel():
        g.n -= 1; return


def _rule22(g):
    if g.ends("εστερ") or g.ends("εστατ"):
        g.n -= 5
    elif g.ends("οτερ") or g.ends("οτατ") or g.ends("υτερ") \
            or g.ends("υτατ") or g.ends("ωτερ") or g.ends("ωτατ"):
        g.n -= 4


def greek_analyzer():
    """GreekAnalyzer.java chain: standard tokenize → GreekLowerCaseFilter
    → (stop) → GreekStemFilter."""
    from .analysis import Analyzer
    from .filters import greek_lowercase

    return Analyzer(pre_filters=(greek_lowercase,),
                    post_filters=(greek_stem,))
