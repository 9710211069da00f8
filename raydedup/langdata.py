"""Language-ID profile data: the most frequent function words per language.

Authored from public common-word knowledge (these are the classic
stopword/function-word heads of each language's frequency list — the same
public data every n-gram language identifier trains on). Word ORDER is the
frequency rank: rank r gets trigram weight ``len(words) - r`` when
``textstats._trigram_profiles()`` expands each word (space-padded) into
character trigrams. Declaration order of languages is the argmax tie-break
order, and the DuckDB oracle is generated from the SAME expanded profile
table, so the two sides can never drift.
"""

from __future__ import annotations

LANG_WORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was",
           "with", "as", "his", "on", "be", "at", "by", "not"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "nicht", "mit",
           "sich", "des", "auf", "für", "ein", "eine", "dem", "auch", "werden"],
    "fr": ["le", "la", "les", "de", "et", "des", "est", "dans", "que", "qui",
           "une", "pour", "pas", "sur", "avec", "sont", "plus", "par"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
           "por", "con", "para", "del", "se", "su", "es", "no"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "non", "sono",
           "della", "del", "con", "si", "le", "nel", "anche", "come"],
    "pt": ["o", "os", "as", "de", "do", "da", "que", "em", "um", "uma",
           "para", "com", "não", "dos", "se", "mais", "por", "uns"],
    "nl": ["de", "het", "een", "en", "van", "is", "dat", "op", "te", "zijn",
           "met", "voor", "niet", "aan", "ook", "maar", "door", "naar"],
    "sv": ["och", "att", "det", "som", "en", "på", "är", "av", "för", "med",
           "den", "till", "inte", "har", "de", "om", "ett", "vad"],
    "da": ["og", "at", "det", "som", "en", "på", "er", "af", "for", "med",
           "den", "til", "ikke", "har", "de", "om", "et", "hvad"],
    "no": ["og", "at", "det", "som", "en", "på", "er", "av", "for", "med",
           "den", "til", "ikke", "har", "jeg", "om", "et", "hva"],
    "fi": ["ja", "on", "että", "ei", "se", "hän", "oli", "mutta", "kun",
           "niin", "kuin", "myös", "joka", "ovat", "tai", "sen", "siitä", "jos"],
    "pl": ["i", "w", "nie", "na", "się", "że", "jest", "do", "z", "to",
           "jak", "po", "co", "tak", "za", "od", "ale", "przez"],
    "cs": ["a", "je", "se", "na", "to", "že", "s", "z", "do", "které",
           "jako", "za", "ale", "po", "pro", "tak", "co", "už"],
    "sk": ["a", "je", "sa", "na", "to", "že", "s", "z", "do", "ktoré",
           "ako", "za", "ale", "po", "pre", "tak", "čo", "už"],
    "hu": ["a", "az", "és", "hogy", "nem", "is", "egy", "van", "de", "volt",
           "mint", "meg", "el", "ki", "csak", "már", "ha", "úgy"],
    "ro": ["și", "de", "la", "în", "cu", "este", "un", "o", "pe", "care",
           "nu", "se", "din", "mai", "pentru", "sunt", "dar", "fost"],
    "tr": ["ve", "bir", "bu", "da", "de", "için", "ile", "olarak", "çok",
           "daha", "gibi", "kadar", "ama", "en", "sonra", "var", "olan", "ne"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini",
           "dari", "dalam", "akan", "pada", "juga", "ke", "karena", "ada",
           "mereka", "sebagai"],
    "vi": ["và", "của", "là", "có", "trong", "được", "các", "một", "này",
           "cho", "không", "với", "người", "những", "đã", "khi", "ra", "đến"],
    "ca": ["i", "el", "la", "els", "les", "de", "que", "en", "un", "una",
           "per", "amb", "del", "és", "no", "més", "com", "al"],
    "hr": ["i", "je", "u", "se", "na", "da", "za", "su", "s", "od",
           "koji", "ne", "o", "kao", "ali", "iz", "će", "što"],
    "et": ["ja", "on", "ei", "et", "ta", "see", "oli", "kui", "ka", "oma",
           "mis", "aga", "või", "siis", "tema", "selle", "üle", "välja"],
    "lt": ["ir", "yra", "kad", "į", "su", "tai", "jis", "bet", "iš", "kaip",
           "dėl", "buvo", "jo", "už", "per", "taip", "nuo", "apie"],
    "lv": ["un", "ir", "ka", "uz", "ar", "tas", "viņš", "bet", "no", "kā",
           "par", "bija", "viņa", "jau", "tikai", "arī", "pēc", "līdz"],
    "ru": ["и", "в", "не", "на", "что", "он", "с", "как", "это", "по",
           "но", "из", "за", "то", "был", "она", "так", "его"],
    "uk": ["і", "в", "не", "на", "що", "він", "з", "як", "це", "по",
           "але", "із", "за", "то", "був", "вона", "так", "його"],
    "el": ["και", "το", "να", "της", "που", "την", "με", "για", "από",
           "στο", "είναι", "τα", "τον", "δεν", "ως", "οι", "του", "μια"],
}
