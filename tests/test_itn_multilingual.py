

def test_grammar_archive_roundtrip(tmp_path):
    """The exported grammar archive (FAR-export role) must rebuild ITN
    functions that match the module lexicons on every language."""
    from funasr_tpu.text.export_grammar import export_grammar, load_grammar
    from funasr_tpu.text.multilingual import ITN_FUNCS

    path = str(tmp_path / "itn_grammar.json")
    archive = export_grammar(path)
    assert archive["format"] == "funasr_tpu_itn_grammar"
    funcs = load_grammar(path)
    samples = {
        "de": "zweihundert dreiundvierzig",
        "es": "doscientos cuarenta y tres",
        "fr": "deux cents quarante trois",
        "pt": "duzentos e quarenta e tres",
        "ru": "двести сорок три",
        "id": "dua ratus empat puluh tiga",
        "vi": "hai trăm bốn ba",
        "tl": "dalawang daan",
        "ja": "三百二十五",
        "ko": "삼백이십오",
        "zh": "三百二十五",
    }
    for lang, text in samples.items():
        assert lang in funcs, lang
        rebuilt = funcs[lang](text)
        if lang in ITN_FUNCS:
            assert rebuilt == ITN_FUNCS[lang](text), (lang, rebuilt)
        assert any(ch.isdigit() for ch in rebuilt), (lang, rebuilt)


def test_zh_tn_classes():
    """Full Chinese written->spoken TN (cn_tn.py role)."""
    from funasr_tpu.text.zh_en_tn import normalize_zh, num2zh
    assert num2zh(10500) == "一万零五百"
    assert num2zh(12345) == "一万二千三百四十五"
    assert num2zh(205) == "二百零五"
    assert num2zh(10) == "十"
    assert normalize_zh("占12%") == "占百分之十二"
    assert normalize_zh("3/4的人") == "四分之三的人"
    assert normalize_zh("2024年10月1日") == "二零二四年十月一日"
    assert normalize_zh("8:30开会") == "八点三十分开会"
    assert normalize_zh("¥3.5") == "三点五元"
    assert normalize_zh("花了25块") == "花了二十五块"
    assert normalize_zh("电话13812345678") == "电话一三八一二三四五六七八"
    assert normalize_zh("3.14") == "三点一四"


def test_en_tn_classes():
    from funasr_tpu.text.zh_en_tn import normalize_en, num2en_ordinal
    assert num2en_ordinal(21) == "twenty first"
    assert num2en_ordinal(30) == "thirtieth"
    assert normalize_en("$3.50") == "three dollars fifty cents"
    assert normalize_en("12%") == "twelve percent"
    assert normalize_en("the 3rd time") == "the third time"
    assert normalize_en("in 1984") == "in nineteen eighty four"
    assert normalize_en("in 2007") == "in two thousand seven"
    assert normalize_en("2.5 miles") == "two point five miles"
    assert normalize_en("123 things") == "one hundred twenty three things"


def test_normalizer_uses_full_grammars():
    from funasr_tpu.text.inverse_normalize import Normalizer
    assert Normalizer(lang="zh").normalize("占12%") == "占百分之十二"
    assert Normalizer(lang="en").normalize("$5") == "five dollars"


class TestClassRules:
    """Non-cardinal ITN classes (decimal/money/time/ordinal/date/percent) for
    the 9 overlay languages (reference fun_text_processing
    inverse_text_normalization/<lang>/taggers/*)."""

    def _itn(self, lang, text):
        from funasr_tpu.text.inverse_normalize import InverseNormalizer
        return InverseNormalizer(lang=lang).inverse_normalize(text)

    def test_de_classes(self):
        assert self._itn("de", "dreizehn uhr zehn") == "13:10 Uhr"
        assert self._itn("de", "fünf euro zwanzig") == "€5,20"
        assert self._itn("de", "drei komma eins vier") == "3,14"
        assert self._itn("de", "vierundzwanzigster juli zweitausenddreizehn") \
            == "24. Juli 2013"
        assert self._itn("de", "fünfzig prozent") == "50 %"
        assert self._itn("de", "halb zwölf") == "11:30"

    def test_es_classes(self):
        assert self._itn("es", "tres coma catorce") == "3,14"
        assert self._itn("es", "cinco euros con veinte céntimos") == "€5,20"
        assert self._itn("es", "tercero") == "3º"
        assert self._itn("es", "cincuenta por ciento") == "50 %"

    def test_fr_classes(self):
        assert self._itn("fr", "trois virgule quatorze") == "3,14"
        assert self._itn("fr", "cinq euros vingt") == "€5,20"
        assert self._itn("fr", "premier") == "1er"
        assert self._itn("fr", "cinquième") == "5e"
        assert self._itn("fr", "treize heures dix") == "13h10"
        assert self._itn("fr", "cinquante pour cent") == "50 %"

    def test_pt_ru_classes(self):
        assert self._itn("pt", "primeiro") == "1º"
        assert self._itn("pt", "cinquenta por cento") == "50 %"
        assert self._itn("ru", "пять рублей") == "₽5"
        assert self._itn("ru", "третий") == "3-й"
        assert self._itn("ru", "пятьдесят процентов") == "50 %"
        assert self._itn("ru", "три запятая один четыре") == "3,14"

    def test_id_vi_classes(self):
        assert self._itn("id", "lima puluh persen") == "50 %"
        assert self._itn("id", "tiga koma satu empat") == "3,14"
        assert self._itn("vi", "năm mươi phần trăm") == "50 %"

    def test_ja_ko_classes(self):
        assert self._itn("ja", "三時十五分") == "3:15"
        assert self._itn("ja", "三点一四") == "3.14"
        assert self._itn("ja", "五十パーセント") == "50%"
        assert self._itn("ko", "삼점일사") == "3.14"
        assert self._itn("ko", "세시 삼십분") == "3:30"
        assert self._itn("ko", "오십퍼센트") == "50%"

    def test_digit_sequence_reading(self):
        # "eins vier" reads as a digit string, not a sum
        assert self._itn("de", "null sieben eins drei") == "0713"
        assert self._itn("es", "uno cuatro") == "14"
