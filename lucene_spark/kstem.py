"""KStem — Bob Krovetz' dictionary-gated English stemmer.

Reference: analysis/common/src/java/org/apache/lucene/analysis/en/
KStemmer.java (the Lucene port of the original UMass CIIR kstem) and
KStemFilter.java:49.  Published algorithm: R. Krovetz, "Viewing morphology
as an inference process", SIGIR 1993.

Unlike Porter-family stemmers, every suffix transformation is validated
against a ~28k-word English lexicon (KStemData1-8.java, embedded here as
``data/kstem_dict.txt.gz``): a variant is only conflated when the candidate
root is an attested word, so ``memorial`` stays ``memorial`` while
``memorized`` becomes ``memorize``.  Full parity with the reference's own
12,130-pair kstem_examples.txt is asserted in tests/test_kstem.py.

The per-token stemmer is pure Python (dictionary probes dominate), intended
to run inside the usual Arrow-batched analyzer UDFs; the shared lexicon dict
is built once per process at import time of ``_dict()``.
"""

from __future__ import annotations

import gzip
import os

__all__ = ["kstem", "kstem_filter"]

MAX_WORD_LEN = 50

# the 41 '-e' exception nouns (KStemmer.java exceptionWords): roots that end
# in 'e' whose bare form must never absorb -ed/-ing variants (aided -> aid,
# not aide)
_EXCEPTIONS = (
    "aide bathe caste cute dame dime doge done dune envelope gage grille "
    "grippe lobe mane mare nape node pane pate plane pope programme quite "
    "ripe rote rune sage severe shoppe sine slime snipe steppe suite swinge "
    "tare tine tope tripe twine").split()

# irregular form -> root (KStemmer.java directConflations)
_DIRECT = {
    "aging": "age", "going": "go", "goes": "go", "lying": "lie",
    "using": "use", "owing": "owe", "suing": "sue", "dying": "die",
    "tying": "tie", "vying": "vie", "aged": "age", "used": "use",
    "vied": "vie", "cued": "cue", "died": "die", "eyed": "eye",
    "hued": "hue", "iced": "ice", "lied": "lie", "owed": "owe",
    "sued": "sue", "toed": "toe", "tied": "tie", "does": "do",
    "doing": "do", "aeronautical": "aeronautics",
    "mathematical": "mathematics", "political": "politics",
    "metaphysical": "metaphysics", "cylindrical": "cylinder",
    "nazism": "nazi", "ambiguity": "ambiguous", "barbarity": "barbarous",
    "credulity": "credulous", "generosity": "generous",
    "spontaneity": "spontaneous", "unanimity": "unanimous",
    "voracity": "voracious", "fled": "flee", "miscarriage": "miscarry",
}

# nationality -> country (KStemmer.java countryNationality)
_NATIONALITY = {
    "afghan": "afghanistan", "african": "africa", "albanian": "albania",
    "algerian": "algeria", "american": "america", "andorran": "andorra",
    "angolan": "angola", "arabian": "arabia", "argentine": "argentina",
    "armenian": "armenia", "asian": "asia", "australian": "australia",
    "austrian": "austria", "azerbaijani": "azerbaijan",
    "azeri": "azerbaijan", "bangladeshi": "bangladesh",
    "belgian": "belgium", "bermudan": "bermuda", "bolivian": "bolivia",
    "bosnian": "bosnia", "botswanan": "botswana", "brazilian": "brazil",
    "british": "britain", "bulgarian": "bulgaria", "burmese": "burma",
    "californian": "california", "cambodian": "cambodia",
    "canadian": "canada", "chadian": "chad", "chilean": "chile",
    "chinese": "china", "colombian": "colombia", "croat": "croatia",
    "croatian": "croatia", "cuban": "cuba", "cypriot": "cyprus",
    "czechoslovakian": "czechoslovakia", "danish": "denmark",
    "egyptian": "egypt", "equadorian": "equador", "eritrean": "eritrea",
    "estonian": "estonia", "ethiopian": "ethiopia", "european": "europe",
    "fijian": "fiji", "filipino": "philippines", "finnish": "finland",
    "french": "france", "gambian": "gambia", "georgian": "georgia",
    "german": "germany", "ghanian": "ghana", "greek": "greece",
    "grenadan": "grenada", "guamian": "guam", "guatemalan": "guatemala",
    "guinean": "guinea", "guyanan": "guyana", "haitian": "haiti",
    "hawaiian": "hawaii", "holland": "dutch", "honduran": "honduras",
    "hungarian": "hungary", "icelandic": "iceland",
    "indonesian": "indonesia", "iranian": "iran", "iraqi": "iraq",
    "iraqui": "iraq", "irish": "ireland", "israeli": "israel",
    "italian": "italy", "jamaican": "jamaica", "japanese": "japan",
    "jordanian": "jordan", "kampuchean": "cambodia", "kenyan": "kenya",
    "korean": "korea", "kuwaiti": "kuwait", "lankan": "lanka",
    "laotian": "laos", "latvian": "latvia", "lebanese": "lebanon",
    "liberian": "liberia", "libyan": "libya", "lithuanian": "lithuania",
    "macedonian": "macedonia", "madagascan": "madagascar",
    "malaysian": "malaysia", "maltese": "malta",
    "mauritanian": "mauritania", "mexican": "mexico",
    "micronesian": "micronesia", "moldovan": "moldova",
    "monacan": "monaco", "mongolian": "mongolia",
    "montenegran": "montenegro", "moroccan": "morocco",
    "myanmar": "burma", "namibian": "namibia", "nepalese": "nepal",
    "nicaraguan": "nicaragua", "nigerian": "nigeria",
    "norwegian": "norway", "omani": "oman", "pakistani": "pakistan",
    "panamanian": "panama", "papuan": "papua", "paraguayan": "paraguay",
    "peruvian": "peru", "portuguese": "portugal", "romanian": "romania",
    "rumania": "romania", "rumanian": "romania", "russian": "russia",
    "rwandan": "rwanda", "samoan": "samoa", "scottish": "scotland",
    "serb": "serbia", "serbian": "serbia", "siam": "thailand",
    "siamese": "thailand", "slovakia": "slovak", "slovakian": "slovak",
    "slovenian": "slovenia", "somali": "somalia", "somalian": "somalia",
    "spanish": "spain", "swedish": "sweden", "swiss": "switzerland",
    "syrian": "syria", "taiwanese": "taiwan", "tanzanian": "tanzania",
    "texan": "texas", "thai": "thailand", "tunisian": "tunisia",
    "turkish": "turkey", "ugandan": "uganda", "ukrainian": "ukraine",
    "uruguayan": "uruguay", "uzbek": "uzbekistan",
    "venezuelan": "venezuela", "vietnamese": "viet",
    "virginian": "virginia", "yemeni": "yemen", "yugoslav": "yugoslavia",
    "yugoslavian": "yugoslavia", "zambian": "zambia",
    "zealander": "zealand", "zimbabwean": "zimbabwe",
}

# technical terms absent from the base lexicon (KStemmer.java supplementDict)
_SUPPLEMENT = (
    "aids applicator capacitor digitize electromagnet ellipsoid exosphere "
    "extensible ferromagnet graphics hydromagnet polygraph toroid "
    "superconduct backscatter connectionism").split()

# proper nouns that must not be stemmed (KStemmer.java properNouns)
_PROPER_NOUNS = (
    "abrams achilles acropolis adams agnes aires alexander alexis alfred "
    "algiers alps amadeus ames amos andes angeles annapolis antilles "
    "aquarius archimedes arkansas asher ashly athens atkins atlantis avis "
    "bahamas bangor barbados barger bering brahms brandeis brussels "
    "bruxelles cairns camoros camus carlos celts chalker charles cheops "
    "ching christmas cocos collins columbus confucius conners connolly "
    "copernicus cramer cyclops cygnus cyprus dallas damascus daniels davies "
    "davis decker denning dennis descartes dickens doris douglas downs "
    "dreyfus dukakis dulles dumfries ecclesiastes edwards emily erasmus "
    "euphrates evans everglades fairbanks federales fisher fitzsimmons "
    "fleming forbes fowler france francis goering goodling goths grenadines "
    "guiness hades harding harris hastings hawkes hawking hayes heights "
    "hercules himalayas hippocrates hobbs holmes honduras hopkins hughes "
    "humphreys illinois indianapolis inverness iris iroquois irving isaacs "
    "italy james jarvis jeffreys jesus jones josephus judas julius kansas "
    "keynes kipling kiwanis lansing laos leeds levis leviticus lewis louis "
    "maccabees madras maimonides maldive massachusetts matthews mauritius "
    "memphis mercedes midas mingus minneapolis mohammed moines morris moses "
    "myers myknos nablus nanjing nantes naples neal netherlands nevis "
    "nostradamus oedipus olympus orleans orly papas paris parker pauling "
    "peking pershing peter peters philippines phineas pisces pryor "
    "pythagoras queens rabelais ramses reynolds rhesus rhodes richards "
    "robins rodgers rogers rubens sagittarius seychelles socrates texas "
    "thames thomas tiberias tunis venus vilnius wales warner wilkins "
    "williams wyoming xmas yonkers zeus frances aarhus adonis andrews angus "
    "antares aquinas arcturus ares artemis augustus ayers barnabas barnes "
    "becker bejing biggs billings boeing boris borroughs briggs buenos "
    "calais caracas cassius cerberus ceres cervantes chantilly chartres "
    "chester connally conner coors cummings curtis daedalus dionysus dobbs "
    "dolores edmonds").split()


_DICT: dict[str, tuple[str | None, bool]] | None = None


def _dict() -> dict[str, tuple[str | None, bool]]:
    """word -> (root or None, is_exception); built once per process."""
    global _DICT
    if _DICT is None:
        d: dict[str, tuple[str | None, bool]] = {}
        for w in _EXCEPTIONS:
            d[w] = (w, True)
        for w, root in _DIRECT.items():
            d[w] = (root, False)
        for w, root in _NATIONALITY.items():
            d[w] = (root, False)
        path = os.path.join(os.path.dirname(__file__), "data",
                            "kstem_dict.txt.gz")
        with gzip.open(path, "rt", encoding="utf-8") as f:
            for w in f.read().split():
                d.setdefault(w, (None, False))
        for w in _SUPPLEMENT:
            d.setdefault(w, (None, False))
        for w in _PROPER_NOUNS:
            d.setdefault(w, (None, False))
        _DICT = d
    return _DICT


_VOWELS = "aeiou"


class _KStem:
    """Mutable stemming state: ``w`` the working buffer, ``k`` the index of
    the final letter, ``j`` the index of the letter before the last-matched
    suffix, ``entry`` the last dictionary probe (None = last probe missed)."""

    __slots__ = ("w", "k", "j", "entry", "d")

    def __init__(self, word: str, d):
        self.w = word
        self.k = len(word) - 1
        self.j = 0
        self.entry = None
        self.d = d

    # -- buffer primitives ------------------------------------------------
    def set_len(self, n: int):
        self.w = self.w[:n]

    def write(self, s: str):
        self.w += s

    def set_char(self, i: int, c: str):
        if i == len(self.w):
            self.w += c
        else:
            self.w = self.w[:i] + c + self.w[i + 1:]

    def set_suffix(self, s: str):
        self.w = self.w[:self.j + 1] + s
        self.k = self.j + len(s)

    # -- predicates --------------------------------------------------------
    def is_cons(self, i: int) -> bool:
        ch = self.w[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self.is_cons(i - 1)

    def is_vowel(self, i: int) -> bool:
        return not self.is_cons(i)

    def vowel_in_stem(self) -> bool:
        return any(self.is_vowel(i) for i in range(self.j + 1))

    def double_c(self, i: int) -> bool:
        return i >= 1 and self.w[i] == self.w[i - 1] and self.is_cons(i)

    def ends_in(self, s: str) -> bool:
        if len(s) > self.k:
            return False
        if self.w.endswith(s):
            self.j = len(self.w) - len(s) - 1
            return True
        return False

    # -- dictionary probes ---------------------------------------------------
    def lookup(self) -> bool:
        self.entry = self.d.get(self.w)
        return self.entry is not None

    def word_in_dict(self):
        if self.entry is not None:
            return self.entry
        e = self.d.get(self.w)
        if e is not None and not e[1]:
            self.entry = e
        return e

    # -- suffix routines (KStemmer.java order and logic) --------------------
    def plural(self):
        if self.w[self.k] != "s":
            return
        if self.ends_in("ies"):
            self.set_len(self.j + 3)
            self.k -= 1
            if self.lookup():  # calories -> calorie
                return
            self.k += 1
            self.write("s")
            self.set_suffix("y")
            self.lookup()
        elif self.ends_in("es"):
            # try just removing the "s"
            self.set_len(self.j + 2)
            self.k -= 1
            # exception for double s prevents crosses -> crosse
            try_e = self.j > 0 and not (self.w[self.j] == "s"
                                        and self.w[self.j - 1] == "s")
            if try_e and self.lookup():
                return
            # try removing the "es"
            self.set_len(self.j + 1)
            self.k -= 1
            if self.lookup():
                return
            # the default is to retain the "e"
            self.write("e")
            self.k += 1
            if not try_e:
                self.lookup()
        else:
            if len(self.w) > 3 and self.w[self.k - 1] != "s" \
                    and not self.ends_in("ous"):
                self.set_len(self.k)
                self.k -= 1
                self.lookup()

    def past_tense(self):
        if len(self.w) <= 4:
            return
        if self.ends_in("ied"):
            self.set_len(self.j + 3)
            self.k -= 1
            if self.lookup():  # died -> die, not dy
                return
            self.k += 1
            self.write("d")
            self.set_suffix("y")
            self.lookup()
            return
        if self.ends_in("ed") and self.vowel_in_stem():
            # root ending in 'e'?
            self.set_len(self.j + 2)
            self.k = self.j + 1
            e = self.word_in_dict()
            if e is not None and not e[1]:
                return
            # try removing the "ed"
            self.set_len(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            # try undoubling a final consonant (backfilled -> backfill)
            if self.double_c(self.k):
                self.set_len(self.k)
                self.k -= 1
                if self.lookup():
                    return
                self.write(self.w[self.k])
                self.k += 1
                self.lookup()
                return
            # an un- prefix leaves the word alone
            if self.w[0] == "u" and self.w[1] == "n":
                self.write("ed")
                self.k += 2
                return
            # prefer an 'e' ending (microcoded -> microcode)
            self.set_len(self.j + 1)
            self.write("e")
            self.k = self.j + 1

    def aspect(self):
        if len(self.w) <= 5:
            return
        if self.ends_in("ing") and self.vowel_in_stem():
            # try an 'e' ending first
            self.set_char(self.j + 1, "e")
            self.set_len(self.j + 2)
            self.k = self.j + 1
            e = self.word_in_dict()
            if e is not None and not e[1]:
                return
            self.set_len(self.k)
            self.k -= 1
            if self.lookup():
                return
            if self.double_c(self.k):
                self.k -= 1
                self.set_len(self.k + 1)
                if self.lookup():
                    return
                self.write(self.w[self.k])  # leave the consonant doubled
                self.k += 1
                self.lookup()
                return
            if self.j > 0 and self.is_cons(self.j) and self.is_cons(self.j - 1):
                self.k = self.j
                self.set_len(self.k + 1)
                return
            self.set_len(self.j + 1)
            self.write("e")
            self.k = self.j + 1

    def ity(self):
        old_k = self.k
        if not self.ends_in("ity"):
            return
        self.set_len(self.j + 1)  # try removing -ity
        self.k = self.j
        if self.lookup():
            return
        self.write("e")  # try -e
        self.k = self.j + 1
        if self.lookup():
            return
        self.set_char(self.j + 1, "i")
        self.write("ty")
        self.k = old_k
        # -ability / -ibility -> -ble (productive, no dictionary gate)
        if self.j > 0 and self.w[self.j - 1] == "i" and self.w[self.j] == "l":
            self.set_len(self.j - 1)
            self.write("le")
            self.k = self.j
            self.lookup()
            return
        # -ivity -> -ive
        if self.j > 0 and self.w[self.j - 1] == "i" and self.w[self.j] == "v":
            self.set_len(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            self.lookup()
            return
        # -ality -> -al
        if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "l":
            self.set_len(self.j + 1)
            self.k = self.j
            self.lookup()
            return
        if self.lookup():  # immunity -> immune but capacity stays
            return
        self.set_len(self.j + 1)  # default: remove -ity
        self.k = self.j

    def ness(self):
        if self.ends_in("ness"):
            self.set_len(self.j + 1)
            self.k = self.j
            if self.w[self.j] == "i":
                self.set_char(self.j, "y")
            self.lookup()

    def ion(self):
        old_k = self.k
        if not self.ends_in("ion"):
            return
        if self.ends_in("ization"):  # -ization -> -ize, always
            self.set_len(self.j + 3)
            self.write("e")
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_in("ition"):
            self.set_len(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            if self.lookup():  # definition -> define
                return
            self.set_len(self.j + 1)
            self.write("ition")
            self.k = old_k
        elif self.ends_in("ation"):
            self.set_len(self.j + 3)
            self.write("e")
            self.k = self.j + 3
            if self.lookup():  # elimination -> eliminate
                return
            self.set_len(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_len(self.j + 1)  # resignation -> resign
            self.k = self.j
            if self.lookup():
                return
            self.set_len(self.j + 1)
            self.write("ation")
            self.k = old_k
        # -ication after -ation (complication -> complicate, not comply)
        if self.ends_in("ication"):
            self.set_len(self.j + 1)
            self.write("y")
            self.k = self.j + 1
            if self.lookup():  # amplification -> amplify
                return
            self.set_len(self.j + 1)
            self.write("ication")
            self.k = old_k
        # plain -ion
        self.j = self.k - 3
        self.set_len(self.j + 1)
        self.write("e")
        self.k = self.j + 1
        if self.lookup():
            return
        self.set_len(self.j + 1)
        self.k = self.j
        if self.lookup():
            return
        self.set_len(self.j + 1)
        self.write("ion")
        self.k = old_k

    def er_or(self):
        old_k = self.k
        if self.w[self.k] != "r":
            return
        if self.ends_in("izer"):  # -izer -> -ize, always
            self.set_len(self.j + 4)
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_in("er") or self.ends_in("or"):
            word_char = self.w[self.j + 1]
            if self.double_c(self.j):
                self.set_len(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write(self.w[self.j - 1])
            if self.w[self.j] == "i":  # -ier -> -y
                self.set_char(self.j, "y")
                self.set_len(self.j + 1)
                self.k = self.j
                if self.lookup():
                    return
                self.set_char(self.j, "i")
                self.write("e")
            if self.w[self.j] == "e":  # -eer
                self.set_len(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write("e")
            self.set_len(self.j + 2)  # remove -r
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_len(self.j + 1)  # remove -er/-or
            self.k = self.j
            if self.lookup():
                return
            self.write("e")  # -or -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_len(self.j + 1)
            self.write(word_char + "r")
            self.k = old_k

    def ly(self):
        old_k = self.k
        if not self.ends_in("ly"):
            return
        self.set_char(self.j + 2, "e")  # -ly -> -le
        if self.lookup():
            return
        self.set_char(self.j + 2, "y")
        self.set_len(self.j + 1)  # remove -ly
        self.k = self.j
        if self.lookup():
            return
        if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "l":
            return  # -ally -> -al, always
        self.write("ly")
        self.k = old_k
        if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "b":
            self.set_char(self.j + 2, "e")  # -ably -> -able, always
            self.k = self.j + 2
            return
        if self.w[self.j] == "i":  # militarily -> military
            self.set_len(self.j)
            self.write("y")
            self.k = self.j
            if self.lookup():
                return
            self.set_len(self.j)
            self.write("ily")
            self.k = old_k
        self.set_len(self.j + 1)  # default: remove -ly
        self.k = self.j

    def al(self):
        old_k = self.k
        if len(self.w) < 4:
            return
        if not self.ends_in("al"):
            return
        self.set_len(self.j + 1)
        self.k = self.j
        if self.lookup():  # remove -al
            return
        if self.double_c(self.j):
            self.set_len(self.j)
            self.k = self.j - 1
            if self.lookup():
                return
            self.write(self.w[self.j - 1])
        self.set_len(self.j + 1)
        self.write("e")  # -al -> -e
        self.k = self.j + 1
        if self.lookup():
            return
        self.set_len(self.j + 1)
        self.write("um")  # optimal -> optimum
        self.k = self.j + 2
        if self.lookup():
            return
        self.set_len(self.j + 1)
        self.write("al")
        self.k = old_k
        if self.j > 0 and self.w[self.j - 1] == "i" and self.w[self.j] == "c":
            self.set_len(self.j - 1)  # remove -ical
            self.k = self.j - 2
            if self.lookup():
                return
            self.set_len(self.j - 1)
            self.write("y")  # bibliographical -> bibliography
            self.k = self.j - 1
            if self.lookup():
                return
            self.set_len(self.j - 1)
            self.write("ic")  # default: -ical -> -ic
            self.k = self.j
            self.lookup()
            return
        if self.w[self.j] == "i":  # some -ial endings drop
            self.set_len(self.j)
            self.k = self.j - 1
            if self.lookup():
                return
            self.write("ial")
            self.k = old_k
            self.lookup()

    def ive(self):
        old_k = self.k
        if not self.ends_in("ive"):
            return
        self.set_len(self.j + 1)  # remove -ive
        self.k = self.j
        if self.lookup():
            return
        self.write("e")  # -ive -> -e
        self.k = self.j + 1
        if self.lookup():
            return
        self.set_len(self.j + 1)
        self.write("ive")
        if self.j > 0 and self.w[self.j - 1] == "a" and self.w[self.j] == "t":
            self.set_char(self.j - 1, "e")  # determinative -> determine
            self.set_len(self.j)
            self.k = self.j - 1
            if self.lookup():
                return
            self.set_len(self.j - 1)  # remove -ative
            if self.lookup():
                return
            self.write("ative")
            self.k = old_k
        # -ive -> -ion (injunctive -> injunction)
        self.set_char(self.j + 2, "o")
        self.set_char(self.j + 3, "n")
        if self.lookup():
            return
        self.set_char(self.j + 2, "v")
        self.set_char(self.j + 3, "e")
        self.k = old_k

    def ize(self):
        old_k = self.k
        if not self.ends_in("ize"):
            return
        self.set_len(self.j + 1)  # remove -ize
        self.k = self.j
        if self.lookup():
            return
        self.write("i")
        if self.double_c(self.j):
            self.set_len(self.j)
            self.k = self.j - 1
            if self.lookup():
                return
            self.write(self.w[self.j - 1])
        self.set_len(self.j + 1)
        self.write("e")  # -ize -> -e
        self.k = self.j + 1
        if self.lookup():
            return
        self.set_len(self.j + 1)
        self.write("ize")
        self.k = old_k

    def ment(self):
        old_k = self.k
        if self.ends_in("ment"):
            self.set_len(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.write("ment")
            self.k = old_k

    def ble(self):
        old_k = self.k
        if not self.ends_in("ble"):
            return
        if self.w[self.j] not in "ai":
            return
        word_char = self.w[self.j]
        self.set_len(self.j)  # remove -able/-ible
        self.k = self.j - 1
        if self.lookup():
            return
        if self.double_c(self.k):
            self.set_len(self.k)
            self.k -= 1
            if self.lookup():
                return
            self.k += 1
            self.write(self.w[self.k - 1])
        self.set_len(self.j)
        self.write("e")  # -a/ible -> -e
        self.k = self.j
        if self.lookup():
            return
        self.set_len(self.j)
        self.write("ate")  # compensable -> compensate
        self.k = self.j + 2
        if self.lookup():
            return
        self.set_len(self.j)
        self.write(word_char + "ble")
        self.k = old_k

    def ism(self):
        if self.ends_in("ism"):
            self.set_len(self.j + 1)
            self.k = self.j
            self.lookup()

    def ic(self):
        if self.ends_in("ic"):
            self.set_len(self.j + 3)
            self.write("al")  # canonic -> canonical
            self.k = self.j + 4
            if self.lookup():
                return
            self.set_char(self.j + 1, "y")  # -ic -> -y
            self.set_len(self.j + 2)
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_char(self.j + 1, "e")  # -ic -> -e
            if self.lookup():
                return
            self.set_len(self.j + 1)  # remove -ic
            self.k = self.j
            if self.lookup():
                return
            self.write("ic")
            self.k = self.j + 2

    def ncy(self):
        if self.ends_in("ncy"):
            if self.w[self.j] not in "ea":
                return
            self.set_char(self.j + 2, "t")  # -ncy -> -nt
            self.set_len(self.j + 3)
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_char(self.j + 2, "c")  # default: -nce
            self.write("e")
            self.k = self.j + 3
            self.lookup()

    def nce(self):
        old_k = self.k
        if self.ends_in("nce"):
            word_char = self.w[self.j]
            if word_char not in "ea":
                return
            self.set_len(self.j)
            self.write("e")  # adherance -> adhere
            self.k = self.j
            if self.lookup():
                return
            self.set_len(self.j)  # disappearance -> disappear
            self.k = self.j - 1
            if self.lookup():
                return
            self.write(word_char + "nce")
            self.k = old_k


def kstem(term: str) -> str:
    """KStemFilter analog for one (already-lowercased) token."""
    n = len(term)
    if n <= 2 or n >= MAX_WORD_LEN or not term.isascii() or not term.isalpha() \
            or not term.islower():
        return term
    d = _dict()
    e = d.get(term)
    if e is not None:
        return e[0] if e[0] is not None else term

    st = _KStem(term, d)
    while True:
        st.plural()
        if st.entry is not None:
            break
        st.past_tense()
        if st.entry is not None:
            break
        st.aspect()
        if st.entry is not None:
            break
        st.ity()
        if st.entry is not None:
            break
        st.ness()
        if st.entry is not None:
            break
        st.ion()
        if st.entry is not None:
            break
        st.er_or()
        if st.entry is not None:
            break
        st.ly()
        if st.entry is not None:
            break
        st.al()
        if st.entry is not None:
            break
        st.word_in_dict()
        st.ive()
        if st.entry is not None:
            break
        st.ize()
        if st.entry is not None:
            break
        st.ment()
        if st.entry is not None:
            break
        st.ble()
        if st.entry is not None:
            break
        st.ism()
        if st.entry is not None:
            break
        st.ic()
        if st.entry is not None:
            break
        st.ncy()
        if st.entry is not None:
            break
        st.nce()
        break

    if st.entry is not None and st.entry[0] is not None:
        return st.entry[0]
    return st.w


def kstem_filter(tokens: list[str]) -> list[str]:
    """KStemFilter over a token stream (terms must already be lowercase)."""
    return [kstem(t) for t in tokens]
