"""Snowball-english stemmer unit tests against published sample vocabulary
(snowballstem.org english voc/output pairs, spot set) plus algorithm edge
cases."""

import pytest

from searchenginepp_spark.functions.porter2 import MemoStemmer, stem

# (input, expected) pairs from the published Snowball english sample vocabulary
VECTORS = [
    ("consign", "consign"), ("consigned", "consign"), ("consigning", "consign"),
    ("consignment", "consign"),
    ("consist", "consist"), ("consisted", "consist"), ("consistency", "consist"),
    ("consistent", "consist"), ("consistently", "consist"),
    ("consisting", "consist"), ("consists", "consist"),
    ("consolation", "consol"), ("consolations", "consol"),
    ("consolatory", "consolatori"),
    ("console", "consol"), ("consoled", "consol"), ("consoles", "consol"),
    ("consolidate", "consolid"), ("consolidated", "consolid"),
    ("consolidating", "consolid"),
    ("consoling", "consol"),
    ("consols", "consol"),
    ("consonant", "conson"),
    ("consort", "consort"), ("consorted", "consort"), ("consorting", "consort"),
    ("conspicuous", "conspicu"), ("conspicuously", "conspicu"),
    ("conspiracy", "conspiraci"),
    ("conspirator", "conspir"), ("conspirators", "conspir"),
    ("conspire", "conspir"), ("conspired", "conspir"), ("conspiring", "conspir"),
    ("constable", "constabl"), ("constables", "constabl"),
    ("constance", "constanc"), ("constancy", "constanc"),
    ("constant", "constant"),
    ("knack", "knack"), ("knackeries", "knackeri"), ("knacks", "knack"),
    ("knag", "knag"),
    ("knave", "knave"), ("knaves", "knave"), ("knavish", "knavish"),
    ("kneaded", "knead"), ("kneading", "knead"),
    ("knee", "knee"), ("kneel", "kneel"), ("kneeled", "kneel"),
    ("kneeling", "kneel"), ("kneels", "kneel"), ("knees", "knee"),
    ("knell", "knell"), ("knelt", "knelt"),
    ("knew", "knew"),
    ("knick", "knick"), ("knif", "knif"), ("knife", "knife"),
    ("knight", "knight"), ("knightly", "knight"), ("knights", "knight"),
    ("knit", "knit"), ("knits", "knit"), ("knitted", "knit"),
    ("knitting", "knit"),
    ("knives", "knive"),
    ("knob", "knob"), ("knobs", "knob"),
    ("knock", "knock"), ("knocked", "knock"), ("knocker", "knocker"),
    ("knockers", "knocker"), ("knocking", "knock"), ("knocks", "knock"),
    ("knopp", "knopp"), ("knot", "knot"), ("knots", "knot"),
    # classic porter2 behaviour checks
    ("flies", "fli"), ("dies", "die"), ("ties", "tie"), ("cries", "cri"),
    ("dying", "die"), ("lying", "lie"), ("tying", "tie"),
    ("skis", "ski"), ("skies", "sky"), ("sky", "sky"), ("news", "news"),
    ("early", "earli"), ("only", "onli"), ("singly", "singl"),
    ("generate", "generat"), ("generates", "generat"),
    ("generously", "generous"),
    ("communism", "communism"), ("arsenal", "arsenal"),
    ("agreed", "agre"), ("feed", "feed"),
    ("plastered", "plaster"), ("bled", "bled"), ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"),
    ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("cry", "cri"), ("by", "by"), ("say", "say"),
    ("relational", "relat"), ("conditional", "condit"), ("rational", "ration"),
    ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("conformabli", "conform"),
    ("radicalli", "radic"), ("differentli", "differ"),
    ("vileli", "vile"), ("analogousli", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formaliti", "formal"),
    ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
    # NOTE: porter2 (unlike porter1) requires R2 for "ative"; R2 of
    # "formative" starts at "ive", so step 4 strips "ive" → "format"
    ("triplicate", "triplic"), ("formative", "format"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"),
    ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"),
    ("communism", "communism"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # twinkle golden words
    ("twinkle", "twinkl"), ("little", "littl"), ("bat", "bat"),
    ("wonder", "wonder"), ("world", "world"), ("like", "like"),
    ("tea", "tea"), ("tray", "tray"),
]


@pytest.mark.parametrize("word,expected", VECTORS)
def test_vectors(word, expected):
    assert stem(word) == expected


def test_short_words_untouched():
    assert stem("a") == "a"
    assert stem("ab") == "ab"
    assert stem("i") == "i"


def test_memo_stemmer():
    st = MemoStemmer()
    assert st("running") == "run"
    assert st("running") == "run"
    assert st._memo["running"] == "run"
