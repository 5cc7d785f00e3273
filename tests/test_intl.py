"""Non-Latin-script analysis (analysis/intl.py): Sorani golden vocabulary
sweep plus the reference's own inline test cases for Arabic, Persian,
Hindi, Indonesian, Bulgarian, Czech, and Latvian.

Sorani golden: ckbtestdata.zip (8,272 pairs through the full SoraniAnalyzer
chain).  Inline cases lifted from the reference's Test*Stemmer/
Test*Normalizer files (lucene/analysis/common/src/test/.../{ar,fa,hi,id,
bg,cz,lv}/).
"""

import gzip
import os

import pytest

from lucene_solr_spark.analysis import intl as I

_DATA = os.path.join(os.path.dirname(__file__), "data")


def test_sorani_golden_vocabulary():
    n, bad = 0, []
    with gzip.open(os.path.join(_DATA, "ckb.txt.gz"), "rt", encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 2:
                continue
            a, b = parts
            n += 1
            g = I.sorani_analyze(a)
            if g != b:
                bad.append((a, g, b))
    assert n == 8272
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


ARABIC_STEM = [
    ("الحسن", "حسن"), ("والحسن", "حسن"), ("بالحسن", "حسن"), ("كالحسن", "حسن"),
    ("فالحسن", "حسن"), ("للاخر", "اخر"), ("وحسن", "حسن"), ("زوجها", "زوج"),
    ("ساهدان", "ساهد"), ("ساهدات", "ساهد"), ("ساهدون", "ساهد"),
    ("ساهدين", "ساهد"), ("ساهديه", "ساهد"), ("ساهدية", "ساهد"),
    ("ساهده", "ساهد"), ("ساهدة", "ساهد"), ("ساهدي", "ساهد"),
    ("وساهدون", "ساهد"), ("ساهدهات", "ساهد"), ("الو", "الو"),
    ("English", "English"),
]

ARABIC_NORM = [
    ("آجن", "اجن"), ("أحمد", "احمد"), ("إعاذ", "اعاذ"), ("بنى", "بني"),
    ("فاطمة", "فاطمه"), ("روبرـــــت", "روبرت"), ("مَبنا", "مبنا"),
    ("علِي", "علي"), ("بُوات", "بوات"), ("ولداً", "ولدا"), ("ولدٍ", "ولد"),
    ("ولدٌ", "ولد"), ("نلْسون", "نلسون"), ("هتميّ", "هتمي"),
]

PERSIAN_NORM = [
    ("های", "هاي"), ("هاے", "هاي"), ("کشاندن", "كشاندن"),
    ("كتابۀ", "كتابه"), ("كتابهٔ", "كتابه"), ("زادہ", "زاده"),
]

HINDI_STEM = [
    ("लडका", "लडक"), ("लडके", "लडक"), ("लडकों", "लडक"), ("गुरु", "गुर"),
    ("गुरुओं", "गुर"), ("दोस्त", "दोस्त"), ("दोस्तों", "दोस्त"),
    ("लडकी", "लडक"), ("लडकियों", "लडक"), ("किताब", "किताब"),
    ("किताबें", "किताब"), ("किताबों", "किताब"), ("खाना", "खा"),
    ("खाता", "खा"), ("खाती", "खा"), ("खा", "खा"), ("कठिनाइयां", "कठिन"),
    ("कठिन", "कठिन"),
]

HINDI_NORM = [
    ("अँगरेज़ी", "अंगरेजि"), ("अँगरेजी", "अंगरेजि"), ("अँग्रेज़ी", "अंगरेजि"),
    ("अंग्रेजी", "अंगरेजि"), ("क़िताब", "किताब"), ("फ़र्ज़", "फरज"),
    ("क़र्ज़", "करज"), ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"), ("शार्‍मा", "शारमा"),
    ("शार्‌मा", "शारमा"), ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"),
    ("आईऊॠॡऐऔीूॄॣैौ", "अइउऋऌएओिुृॢेो"),
]

INDONESIAN = [
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
    ("disalahgunakan", "salahguna"), ("pertanggungjawaban", "tanggungjawab"),
    ("mempertanggungjawabkan", "tanggungjawab"),
    ("dipertanggungjawabkan", "tanggungjawab"), ("pelaksanaan", "laksana"),
    ("pelaksana", "laksana"), ("melaksanakan", "laksana"),
    ("dilaksanakan", "laksana"), ("melibatkan", "libat"),
    ("terlibat", "libat"), ("penculikan", "culik"), ("menculik", "culik"),
    ("diculik", "culik"), ("penculik", "culik"), ("perubahan", "ubah"),
    ("peledakan", "ledak"), ("penanganan", "tangan"),
    ("kepolisian", "polisi"), ("kenaikan", "naik"), ("bersenjata", "senjata"),
    ("penyelewengan", "seleweng"), ("kecelakaan", "celaka"),
]

BULGARIAN = [
    ("град", "град"), ("града", "град"), ("градът", "град"),
    ("градове", "град"), ("градовете", "град"), ("народ", "народ"),
    ("народа", "народ"), ("народът", "народ"), ("народи", "народ"),
    ("народите", "народ"), ("народе", "народ"), ("път", "път"),
    ("пътя", "път"), ("пътят", "път"), ("пътища", "път"),
    ("пътищата", "път"), ("градец", "градец"), ("градеца", "градец"),
    ("градецът", "градец"), ("градовце", "градовц"),
    ("градовцете", "градовц"), ("дядо", "дяд"), ("дядото", "дяд"),
    ("дядовци", "дяд"), ("дядовците", "дяд"), ("мъж", "мъж"),
    ("мъжа", "мъж"), ("мъже", "мъж"), ("мъжете", "мъж"), ("мъжо", "мъж"),
    ("мъжът", "мъжът"), ("крак", "крак"), ("краката", "крак"),
    ("братя", "брат"), ("братята", "брат"), ("вестта", "вест"),
    ("дървета", "дърв"), ("дърветата", "дърв"), ("морето", "мор"),
    ("изключението", "изключени"), ("изключения", "изключн"),
]

CZECH = [
    ("pán", "pán"), ("páni", "pán"), ("pánové", "pán"), ("pána", "pán"),
    ("pánů", "pán"), ("pánovi", "pán"), ("pánům", "pán"), ("pány", "pán"),
    ("páne", "pán"), ("pánech", "pán"), ("pánem", "pán"), ("hrad", "hrad"),
    ("hradem", "hrad"), ("hradech", "hrad"), ("hradům", "hrad"),
    ("muž", "muh"), ("muži", "muh"), ("mužů", "muh"), ("mužích", "muh"),
    ("stroj", "stroj"), ("strojů", "stroj"), ("strojích", "stroj"),
    ("předseda", "předsd"), ("předsedové", "předsd"), ("předsedou", "předsd"),
    ("soudce", "soudk"), ("soudcích", "soudk"), ("kost", "kost"),
    ("kostí", "kost"), ("kostmi", "kost"), ("píseň", "písň"),
    ("písně", "písn"), ("písněmi", "písn"), ("růže", "růh"), ("růží", "růh"),
    ("žena", "žn"), ("ženy", "žn"), ("žen", "žn"),
]

LATVIAN = [
    ("tēvs", "tēv"), ("tēviem", "tēv"), ("tēvus", "tēv"), ("tēvā", "tēv"),
    ("lācis", "lāc"), ("lāči", "lāc"), ("lāču", "lāc"), ("lāčiem", "lāc"),
    ("lāčus", "lāc"), ("akmens", "akmen"), ("akmeņi", "akmen"),
    ("akmeņus", "akmen"), ("kurmis", "kurm"), ("kurmju", "kurm"),
    ("lietus", "liet"), ("lietiem", "liet"), ("lapa", "lap"),
    ("lapās", "lap"), ("puika", "puik"), ("puikām", "puik"),
    ("egle", "egl"), ("egļu", "egl"), ("govs", "gov"), ("govju", "gov"),
    ("govīm", "gov"), ("zils", "zil"), ("zilais", "zil"), ("zilajiem", "zil"),
    ("zilajās", "zil"), ("krāsns", "krāsn"), ("krāšņu", "krāsn"),
    ("zvaigzne", "zvaigzn"), ("zvaigžņu", "zvaigzn"), ("kāpslis", "kāpsl"),
    ("kāpšļu", "kāpsl"), ("zizlis", "zizl"), ("zižļu", "zizl"),
    ("vilnis", "viln"), ("viļņu", "viln"), ("lelle", "lell"),
    ("leļļu", "lell"), ("pinne", "pinn"), ("piņņu", "pinn"),
    ("rīkste", "rīkst"), ("rīkšu", "rīkst"), ("usa", "usa"),
    ("60ms", "60ms"), ("", ""),
]


@pytest.mark.parametrize(
    "fn,cases",
    [
        (I.arabic_stem, ARABIC_STEM),
        (I.arabic_normalize, ARABIC_NORM),
        (I.persian_normalize, PERSIAN_NORM),
        (I.hindi_stem, HINDI_STEM),
        (I.hindi_normalize, HINDI_NORM),
        (I.indonesian_stem, INDONESIAN),
        (I.bulgarian_stem, BULGARIAN),
        (I.czech_stem, CZECH),
        (I.latvian_stem, LATVIAN),
    ],
    ids=["ar_stem", "ar_norm", "fa_norm", "hi_stem", "hi_norm", "id", "bg",
         "cz", "lv"],
)
def test_reference_inline_cases(fn, cases):
    bad = [(a, fn(a), b) for a, b in cases if fn(a) != b]
    assert not bad, bad


def test_indonesian_inflectional_only():
    # stemDerivational=false keeps derivational affixes
    assert I.indonesian_stem("bukunya", stem_derivational=False) == "buku"
    assert I.indonesian_stem("mengukur", stem_derivational=False) == "mengukur"


def test_intl_stem_map_frame(spark):
    vocab = spark.createDataFrame(
        [("الحسن",), ("mengukur",)], "term string"
    )
    got = {r.term: r.new_term for r in I.intl_stem_map(vocab, "ar").collect()}
    assert got == {"الحسن": "حسن"}
    got = {r.term: r.new_term for r in I.intl_stem_map(vocab, "id").collect()}
    assert got == {"mengukur": "ukur"}
