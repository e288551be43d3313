"""Golden class x language matrix for written->spoken TN (de/es/ru).

Reference grammar sets: ``fun_text_processing/text_normalization/{de,es,ru}/
taggers/`` (cardinal, decimal, ordinal, date, time, money, measure,
telephone); output formats follow the per-class verbalizer docstrings cited
in funasr_tpu/text/multilingual_tn.py."""

import pytest

from funasr_tpu.text.inverse_normalize import Normalizer

GOLDEN = {
    "de": {
        # de/verbalizers/time.py: "02:15 Uhr" -> hour cardinal + "uhr" + min
        "time": [("um 02:15 Uhr", "um zwei uhr fünfzehn"),
                 ("um 1 Uhr", "um ein uhr"),
                 ("14:00 Uhr", "vierzehn uhr")],
        # de/verbalizers/date.py: day ordinal + month + year cardinal
        "date": [("am 4. Mai 2002", "am vierter mai zweitausendzwei"),
                 ("am 24.07.2013", "am vierundzwanzigster juli zweitausenddreizehn")],
        # de/verbalizers/money.py: "ein pfund vierzig" preserve_order form
        "money": [("€5", "fünf euro"),
                  ("1,40 £", "ein pfund vierzig"),
                  ("$12,05", "zwölf dollar fünf")],
        # de/verbalizers/decimal.py: fractional digits spelled one by one
        "decimal": [("3,406", "drei komma vier null sechs")],
        "measure": [("5 km", "fünf kilometer"),
                    ("2,5 kg", "zwei komma fünf kilogramm")],
        "percent": [("12%", "zwölf prozent")],
        "ordinal": [("der 3.", "der dritter")],
        "fraction": [("3/4", "drei viertel")],
        "telephone": [("030 1234567", "null drei null eins zwei drei vier "
                                      "fünf sechs sieben")],
        "cardinal": [("243", "zweihundertdreiundvierzig"),
                     ("-5", "minus fünf")],
    },
    "es": {
        # es/verbalizers/time.py: y cuarto / y media forms
        "time": [("a las 02:15", "a las dos y cuarto"),
                 ("02:30", "dos y media"),
                 ("03:40", "tres y cuarenta"),
                 ("02:45", "tres menos cuarto")],
        # es/verbalizers/date.py: day 1 -> primero, "de" connectors kept
        "date": [("31 de marzo de 2000", "treinta y uno de marzo de dos mil"),
                 ("1 de mayo", "primero de mayo")],
        "money": [("$5", "cinco dólares"),
                  ("€1", "un euro"),
                  ("£1,40", "una libra con cuarenta")],
        "decimal": [("3,14", "tres coma uno cuatro")],
        "measure": [("5 km", "cinco kilómetros")],
        "percent": [("12%", "doce por ciento")],
        "ordinal": [("el 3º", "el tercero"), ("la 2ª", "la segunda")],
        "telephone": [("91 1234567", "nueve uno uno dos tres cuatro cinco "
                                     "seis siete")],
        "cardinal": [("243", "doscientos cuarenta y tres")],
    },
    "ru": {
        # ru/verbalizers/time.py: "02:15" -> два часа пятнадцать минут
        "time": [("в 02:15", "в два часа пятнадцать минут"),
                 ("01:00", "час"),
                 ("05:02", "пять часов две минуты")],
        # ru/verbalizers/date.py: neuter ordinal day + genitive month
        "date": [("1 мая", "первое мая"),
                 ("23 апреля 2002 года",
                  "двадцать третье апреля две тысячи два года")],
        # ru/verbalizers/money.py: пять рублей with count-noun agreement
        "money": [("5 ₽", "пять рублей"), ("2 руб.", "два рубля"),
                  ("21 ₽", "двадцать один рубль"),
                  ("5,02 ₽", "пять рублей две копейки")],
        "decimal": [("3,14", "три запятая один четыре")],
        # ru/verbalizers/measure.py + count forms
        "measure": [("2 кг", "два килограмма"), ("5 км", "пять километров"),
                    ("1 л", "один литр")],
        "percent": [("12%", "двенадцать процентов"),
                    ("21%", "двадцать один процент"),
                    ("2%", "два процента")],
        "telephone": [("495 1234567", "четыре девять пять один два три "
                                      "четыре пять шесть семь")],
        "cardinal": [("243", "двести сорок три")],
    },
}


@pytest.mark.parametrize("lang", sorted(GOLDEN))
def test_tn_class_matrix(lang):
    n = Normalizer(lang=lang)
    failures = []
    for cls, cases in GOLDEN[lang].items():
        for written, spoken in cases:
            got = n.normalize(written)
            if got != spoken:
                failures.append(f"{lang}/{cls}: {written!r} -> {got!r} "
                                f"(want {spoken!r})")
    assert not failures, "\n".join(failures)


@pytest.mark.parametrize("lang", sorted(GOLDEN))
def test_tn_itn_roundtrip_cardinal(lang):
    """TN output for plain cardinals must invert back through the ITN pass."""
    from funasr_tpu.text.inverse_normalize import InverseNormalizer
    inv = InverseNormalizer(lang=lang)
    n = Normalizer(lang=lang)
    for value in (7, 21, 99, 110, 243, 1999, 2024):
        spoken = n.normalize(str(value))
        back = inv.inverse_normalize(spoken)
        assert str(value) in back, (lang, value, spoken, back)
