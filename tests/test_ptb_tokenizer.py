"""PTBTokenizer adversarial suite (VERDICT r3 #8).

Expected outputs are what the reference's COCO harness would score with:
Stanford CoreNLP PTBTokenizer (ptb3Escaping defaults, -preserveLines
-lowerCase) piped through pycocoevalcap's PUNCTUATIONS filter — i.e. the
pipeline executed by dmi/utils/eval_utils.py:195-198.  Each expectation
is transcribed from the published PTB3 tokenization conventions
(tokenizer.sed / CoreNLP PTBLexer docs) plus the wrapper's own python
code; the wrapper's lowercase-before-filter quirk (bracket tokens
survive as -lrb-/-rrb-) is replicated deliberately.

Documented divergences from the Java tool (module docstring of
dmi_tpu/evals/tokenize.py): no americanization, no legacy \\/ \\*
escapes, single-letter initials split their period.  None appear below
as expectations.
"""

import pytest

from dmi_tpu.evals.tokenize import ptb_tokenize

CASES = [
    # --- contractions (PTB3 splits the clitic, keeps the apostrophe) ----
    ("A man can't swim.", ["a", "man", "ca", "n't", "swim"]),
    ("Isn't it?", ["is", "n't", "it"]),
    ("won't stop", ["wo", "n't", "stop"]),
    ("It's a dog's life", ["it", "'s", "a", "dog", "'s", "life"]),
    ("they're here", ["they", "'re", "here"]),
    ("we've seen", ["we", "'ve", "seen"]),
    ("I'll go", ["i", "'ll", "go"]),
    ("I'd rather", ["i", "'d", "rather"]),
    ("I'm sure", ["i", "'m", "sure"]),
    ("shouldn't've", ["should", "n't", "'ve"]),
    # --- assimilations (tokenizer.sed: cannot -> can not, etc.) ---------
    ("He cannot swim", ["he", "can", "not", "swim"]),
    ("Cannot be", ["can", "not", "be"]),
    ("gonna rain", ["gon", "na", "rain"]),
    ("wanna play", ["wan", "na", "play"]),
    ("gotta go", ["got", "ta", "go"]),
    ("lemme see", ["lem", "me", "see"]),
    ("gimme five", ["gim", "me", "five"]),
    ("'tis the season", ["'t", "is", "the", "season"]),
    ("'twas the night", ["'t", "was", "the", "night"]),
    # --- possessives ----------------------------------------------------
    ("the dogs' toys", ["the", "dogs", "toys"]),  # bare ' is filtered
    ("O'Brien's hat", ["o'brien", "'s", "hat"]),  # name-internal ' kept
    # --- quotes (latexQuotes ``/'' are filtered) ------------------------
    ('"A red car"', ["a", "red", "car"]),
    ('he said "stop" loudly', ["he", "said", "stop", "loudly"]),
    ("“curly quotes”", ["curly", "quotes"]),
    ("it’s curly", ["it", "'s", "curly"]),
    ("'single quoted'", ["single", "quoted"]),
    # --- brackets: normalized, then SURVIVE the wrapper's filter (the
    # PUNCTUATIONS list spells them uppercase but runs on lowercased
    # tokens — pycocoevalcap quirk, replicated) --------------------------
    ("(two dogs)", ["-lrb-", "two", "dogs", "-rrb-"]),
    ("[two dogs]", ["-lsb-", "two", "dogs", "-rsb-"]),
    ("{two dogs}", ["-lcb-", "two", "dogs", "-rcb-"]),
    ("a (small) cat", ["a", "-lrb-", "small", "-rrb-", "cat"]),
    # --- hyphenated compounds stay single tokens ------------------------
    ("a well-known man", ["a", "well-known", "man"]),
    ("a 5-year-old boy", ["a", "5-year-old", "boy"]),
    ("state-of-the-art model", ["state-of-the-art", "model"]),
    ("one-two three--four", ["one-two", "three", "four"]),  # -- filtered
    ("an em—dash", ["an", "em", "dash"]),  # em dash -> -- , filtered
    # --- numbers ---------------------------------------------------------
    ("pi is 3.14 exactly", ["pi", "is", "3.14", "exactly"]),
    ("10,000 people", ["10,000", "people"]),
    ("at 3:30 pm", ["at", "3:30", "pm"]),
    ("3/4 cup", ["3/4", "cup"]),
    ("costs $5", ["costs", "$", "5"]),
    ("$3.50 each", ["$", "3.50", "each"]),
    ("50% off", ["50", "%", "off"]),
    ("the 3rd time", ["the", "3rd", "time"]),
    ("version 2a", ["version", "2a"]),
    ("ends with 7.", ["ends", "with", "7"]),
    # --- acronyms keep periods -------------------------------------------
    ("the U.S. flag", ["the", "u.s.", "flag"]),
    ("e.g. a cat", ["e.g.", "a", "cat"]),
    ("at 9 p.m. sharp", ["at", "9", "p.m.", "sharp"]),
    # --- ellipsis / misc punctuation (filtered) ---------------------------
    ("wait... what", ["wait", "what"]),
    ("wait… what", ["wait", "what"]),
    ("a man, a plan, a canal: panama!", ["a", "man", "a", "plan", "a", "canal", "panama"]),
    ("two dogs; one cat", ["two", "dogs", "one", "cat"]),
    ("really?!", ["really"]),
    # --- survivors: symbols NOT in the PUNCTUATIONS list ------------------
    ("step #2", ["step", "#", "2"]),
    ("a+b", ["a", "+", "b"]),
    ("cats & dogs", ["cats", "&", "dogs"]),
    ("50/50 split", ["50/50", "split"]),
    ("an @sign", ["an", "@", "sign"]),
    # --- unicode words pass through untouched -----------------------------
    ("naïve café", ["naïve", "café"]),
    # --- whitespace / newline handling ------------------------------------
    ("two  spaces\nand a newline", ["two", "spaces", "and", "a", "newline"]),
    ("", []),
    ("...", []),
]


@pytest.mark.parametrize("text,want", CASES, ids=[c[0][:24] or "<empty>" for c in CASES])
def test_ptb_adversarial(text, want):
    assert ptb_tokenize(text) == want


def test_idempotent_on_joined_output():
    """Re-tokenizing joined output is stable (scorers may round-trip)."""
    for text, _ in CASES:
        once = ptb_tokenize(text)
        again = ptb_tokenize(" ".join(once))
        assert once == again, (text, once, again)
