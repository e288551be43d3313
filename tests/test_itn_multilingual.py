

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
