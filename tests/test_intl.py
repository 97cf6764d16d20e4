"""Golden-vector tests for lucene_spark.intl — every vector comes from the
reference's own analysis tests (file cited per block)."""

import pytest

from lucene_spark.intl import (
    arabic_normalize,
    arabic_stem,
    bulgarian_stem,
    czech_stem,
    hindi_normalize,
    hindi_stem,
    indonesian_stem,
    intl_analyzer,
    persian_normalize,
)

# analysis/common/src/test/.../ar/TestArabicStemFilter.java:34-120
AR_STEM = [
    ("الحسن", "حسن"), ("والحسن", "حسن"), ("بالحسن", "حسن"),
    ("كالحسن", "حسن"), ("فالحسن", "حسن"), ("للاخر", "اخر"),
    ("وحسن", "حسن"), ("زوجها", "زوج"), ("ساهدان", "ساهد"),
    ("ساهدات", "ساهد"), ("ساهدون", "ساهد"), ("ساهدين", "ساهد"),
    ("ساهديه", "ساهد"), ("ساهدية", "ساهد"), ("ساهده", "ساهد"),
    ("ساهدة", "ساهد"), ("ساهدي", "ساهد"), ("وساهدون", "ساهد"),
    ("ساهدهات", "ساهد"), ("الو", "الو"), ("English", "English"),
]

# analysis/common/src/test/.../ar/TestArabicNormalizationFilter.java:31-76
AR_NORM = [
    ("آجن", "اجن"), ("أحمد", "احمد"), ("إعاذ", "اعاذ"),
    ("بنى", "بني"), ("فاطمة", "فاطمه"), ("روبرـــــت", "روبرت"),
    ("مَبنا", "مبنا"), ("علِي", "علي"), ("بُوات", "بوات"),
    ("ولداً", "ولدا"), ("ولدٍ", "ولد"), ("ولدٌ", "ولد"),
    ("نلْسون", "نلسون"), ("هتميّ", "هتمي"),
]

# analysis/common/src/test/.../fa/TestPersianNormalizationFilter.java:30-56
FA_NORM = [
    ("های", "هاي"), ("هاے", "هاي"), ("کشاندن", "كشاندن"),
    ("كتابۀ", "كتابه"), ("كتابهٔ", "كتابه"), ("زادہ", "زاده"),
]

# analysis/common/src/test/.../hi/TestHindiStemmer.java:30-80
HI_STEM = [
    ("लडका", "लडक"), ("लडके", "लडक"), ("लडकों", "लडक"),
    ("गुरु", "गुर"), ("गुरुओं", "गुर"), ("दोस्त", "दोस्त"),
    ("दोस्तों", "दोस्त"), ("लडकी", "लडक"), ("लडकियों", "लडक"),
    ("किताब", "किताब"), ("किताबें", "किताब"), ("किताबों", "किताब"),
    ("आध्यापीका", "आध्यापीक"), ("आध्यापीकाएं", "आध्यापीक"),
    ("आध्यापीकाओं", "आध्यापीक"), ("खाना", "खा"), ("खाता", "खा"),
    ("खाती", "खा"), ("खा", "खा"), ("कठिनाइयां", "कठिन"),
    ("कठिन", "कठिन"),
]

# analysis/common/src/test/.../hi/TestHindiNormalizer.java:29-59
HI_NORM = [
    ("अँगरेज़ी", "अंगरेजि"), ("अँगरेजी", "अंगरेजि"),
    ("अँग्रेज़ी", "अंगरेजि"), ("अँग्रेजी", "अंगरेजि"),
    ("अंगरेज़ी", "अंगरेजि"), ("अंग्रेजी", "अंगरेजि"),
    ("क़िताब", "किताब"), ("फ़र्ज़", "फरज"), ("क़र्ज़", "करज"),
    ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),
    ("शार्‍मा", "शारमा"), ("शार्‌मा", "शारमा"),
    ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"),
    ("आईऊॠॡऐऔीूॄॣैौ", "अइउऋऌएओिुृॢेो"),
]

# analysis/common/src/test/.../id/TestIndonesianStemmer.java:32-103
ID_STEM = [
    ("bukukah", "buku"), ("adalah", "ada"), ("bukupun", "buku"),
    ("bukuku", "buku"), ("bukumu", "buku"), ("bukunya", "buku"),
    ("mengukur", "ukur"), ("menyapu", "sapu"), ("menduga", "duga"),
    ("menuduh", "uduh"), ("membaca", "baca"), ("merusak", "rusak"),
    ("pengukur", "ukur"), ("penyapu", "sapu"), ("penduga", "duga"),
    ("pembaca", "baca"), ("diukur", "ukur"), ("tersapu", "sapu"),
    ("kekasih", "kasih"), ("berlari", "lari"), ("belajar", "ajar"),
    ("bekerja", "kerja"), ("perjelas", "jelas"), ("pelajar", "ajar"),
    ("pekerja", "kerja"), ("tarikkan", "tarik"), ("ambilkan", "ambil"),
    ("mengambilkan", "ambil"), ("makanan", "makan"), ("janjian", "janji"),
    ("perjanjian", "janji"), ("tandai", "tanda"), ("dapati", "dapat"),
    ("mendapati", "dapat"), ("pantai", "panta"),
    ("penyalahgunaan", "salahguna"), ("menyalahgunakan", "salahguna"),
    ("disalahgunakan", "salahguna"),
    ("pertanggungjawaban", "tanggungjawab"),
    ("mempertanggungjawabkan", "tanggungjawab"),
    ("dipertanggungjawabkan", "tanggungjawab"),
    ("pelaksanaan", "laksana"), ("pelaksana", "laksana"),
    ("melaksanakan", "laksana"), ("dilaksanakan", "laksana"),
    ("melibatkan", "libat"), ("terlibat", "libat"),
    ("penculikan", "culik"), ("menculik", "culik"), ("diculik", "culik"),
    ("penculik", "culik"), ("perubahan", "ubah"), ("peledakan", "ledak"),
    ("penanganan", "tangan"), ("kepolisian", "polisi"),
    ("kenaikan", "naik"), ("bersenjata", "senjata"),
    ("penyelewengan", "seleweng"), ("kecelakaan", "celaka"),
]

# analysis/common/src/test/.../cz/TestCzechStemmer.java:36-112 (nouns)
CZ_STEM = [
    ("pán", "pán"), ("páni", "pán"), ("pánové", "pán"), ("pána", "pán"),
    ("pánů", "pán"), ("pánovi", "pán"), ("pánům", "pán"), ("pány", "pán"),
    ("páne", "pán"), ("pánech", "pán"), ("pánem", "pán"),
    ("hrad", "hrad"), ("hradu", "hrad"), ("hrade", "hrad"),
    ("hradem", "hrad"), ("hrady", "hrad"), ("hradech", "hrad"),
    ("hradům", "hrad"), ("hradů", "hrad"),
    ("muž", "muh"), ("muži", "muh"), ("muže", "muh"), ("mužů", "muh"),
    ("mužům", "muh"), ("mužích", "muh"), ("mužem", "muh"),
    ("stroj", "stroj"), ("stroje", "stroj"), ("strojů", "stroj"),
    ("stroji", "stroj"), ("strojům", "stroj"), ("strojích", "stroj"),
    ("strojem", "stroj"),
    ("předseda", "předsd"), ("předsedové", "předsd"),
    ("předsedy", "předsd"), ("předsedů", "předsd"),
    ("předsedovi", "předsd"), ("předsedům", "předsd"),
    ("předsedu", "předsd"), ("předsedo", "předsd"),
    ("předsedech", "předsd"), ("předsedou", "předsd"),
    ("soudce", "soudk"), ("soudci", "soudk"), ("soudců", "soudk"),
    ("soudcům", "soudk"), ("soudcích", "soudk"), ("soudcem", "soudk"),
    ("kost", "kost"),
]

# analysis/common/src/test/.../bg/TestBulgarianStemmer.java:33-112
BG_STEM = [
    ("град", "град"), ("града", "град"), ("градът", "град"),
    ("градове", "град"), ("градовете", "град"),
    ("народ", "народ"), ("народа", "народ"), ("народът", "народ"),
    ("народи", "народ"), ("народите", "народ"), ("народе", "народ"),
    ("път", "път"), ("пътя", "път"), ("пътят", "път"),
    ("пътища", "път"), ("пътищата", "път"),
    ("градец", "градец"), ("градеца", "градец"), ("градецът", "градец"),
    ("градовце", "градовц"), ("градовцете", "градовц"),
    ("дядо", "дяд"), ("дядото", "дяд"), ("дядовци", "дяд"),
    ("дядовците", "дяд"),
    ("мъж", "мъж"), ("мъжа", "мъж"), ("мъже", "мъж"),
    ("мъжете", "мъж"), ("мъжо", "мъж"), ("мъжът", "мъжът"),
    ("крак", "крак"), ("крака", "крак"), ("кракът", "крак"),
    ("краката", "крак"),
    ("брат", "брат"), ("брата", "брат"), ("братът", "брат"),
    ("братя", "брат"), ("братята", "брат"),
]


@pytest.mark.parametrize("w,want", AR_STEM)
def test_arabic_stem(w, want):
    assert arabic_stem(w) == want


@pytest.mark.parametrize("w,want", AR_NORM)
def test_arabic_normalize(w, want):
    assert arabic_normalize(w) == want


@pytest.mark.parametrize("w,want", FA_NORM)
def test_persian_normalize(w, want):
    assert persian_normalize(w) == want


@pytest.mark.parametrize("w,want", HI_STEM)
def test_hindi_stem(w, want):
    assert hindi_stem(w) == want


@pytest.mark.parametrize("w,want", HI_NORM)
def test_hindi_normalize(w, want):
    assert hindi_normalize(w) == want


@pytest.mark.parametrize("w,want", ID_STEM)
def test_indonesian_stem(w, want):
    assert indonesian_stem(w) == want


@pytest.mark.parametrize("w,want", CZ_STEM)
def test_czech_stem(w, want):
    assert czech_stem(w) == want


@pytest.mark.parametrize("w,want", BG_STEM)
def test_bulgarian_stem(w, want):
    assert bulgarian_stem(w) == want


def test_indonesian_inflectional_only():
    # stemDerivational=false keeps derivational affixes
    # (TestIndonesianStemmer.java:105-118)
    assert indonesian_stem("bukunya", False) == "buku"
    assert indonesian_stem("mengukur", False) == "mengukur"


def test_intl_analyzer_chains():
    # ar chain normalizes THEN stems: the teh marbuta folds to heh and the
    # heh then strips as a suffix (ArabicAnalyzer's filter order)
    a = intl_analyzer("ar")
    assert a.run_token("فاطمة") == "فاطم"
    assert a.run_token("والحسن") == "حسن"
    fa = intl_analyzer("fa")
    assert fa.run_token("کشاندن") == "كشاندن"
    hi = intl_analyzer("hi")
    # normalize (ी -> ि) then stem strips the short vowel sign
    assert hi.run_token("लडकी") == "लडक"
    assert intl_analyzer("id").run_token("mengukur") == "ukur"
    assert intl_analyzer("cs").run_token("páni") == "pán"
    assert intl_analyzer("bg").run_token("градът") == "град"
    with pytest.raises(ValueError):
        intl_analyzer("xx")


def test_routing_analyzer_with_intl():
    from lucene_spark.intl import routing_analyzer_with_intl

    r = routing_analyzer_with_intl()
    # one route per shipped language chain, CJK script detection intact
    for lang, tok, want in [("id", "mengukur", "ukur"),
                            ("lv", "tēviem", "tēv"),
                            ("pt", "balões", "balão"),
                            ("gl", "luces", "luz"),
                            ("es", "casas", "cas"),
                            ("ar", "والحسن", "حسن"),
                            ("cs", "páni", "pán"),
                            ("bg", "градът", "град")]:
        assert r.for_lang(lang).run_token(tok) == want, lang
    toks, _ = r.analyze_text("spark 漢字 text")
    assert "漢字" in "".join(toks) or "漢" in toks[1]
