"""Serbian analysis: the Snowball Serbian stemmer
(``org/tartarus/snowball/ext/SerbianStemmer.java``, wired by
``sr/SerbianAnalyzer.java:111`` after LowerCaseFilter + StopFilter and
before SerbianNormalizationFilter).

Pipeline: Cyrillic-to-Latin transliteration, an ije/je/dj prelude, R1
marking with a vocalic-r adjustment, an unbounded respelling step, then
an R1-gated respelling step or-else an R1-gated ending delete.  Some
respellings apply only to words carrying no diacritic letter (the
algorithm's dual-script aliasing guard).

Data tables are the published Snowball serbian algorithm's (the same
tables the reference's generated Java carries); the logic is written
from the algorithm description.  Goldens from TestSerbianAnalyzer in
tests/test_serbian.py.
"""

from __future__ import annotations

import re

__all__ = ["serbian_stem", "serbian_analyzer"]

_SR_VOWELS = set("aeiou")
_SR_DIACRITICS = set("\u0107\u010d\u0111\u0161\u017e")
# the consonant grouping used by the ije/je prelude context
_SR_CA = "bcdfghjklmnprstvz\u0107\u010d\u0111\u0161\u017e"

_SR_CYR2LAT = {
    'а': 'a', 'б': 'b', 'в': 'v', 'г': 'g', 'д': 'd', 'е': 'e', 'ж':
    'ž', 'з': 'z', 'и': 'i', 'к': 'k', 'л': 'l', 'м': 'm', 'н': 'n',
    'о': 'o', 'п': 'p', 'р': 'r', 'с': 's', 'т': 't', 'у': 'u', 'ф':
    'f', 'х': 'h', 'ц': 'c', 'ч': 'č', 'ш': 'š', 'ђ': 'đ', 'ј': 'j',
    'љ': 'lj', 'њ': 'nj', 'ћ': 'ć', 'џ': 'dž'
}
_SR_CYR_TRANS = {ord(k): v for k, v in _SR_CYR2LAT.items()}

_SR_IJE = re.compile("(?<=[" + _SR_CA + "])ije(?=[" + _SR_CA + "])")
_SR_JE = re.compile("(?<=[" + _SR_CA + "])je(?=[" + _SR_CA + "])")

# (suffix -> (replacement, diacritic-free-words-only)) bucketed by length;
# longest suffix wins, exactly one rule fires per step
_SR_STEP1 = {
    8: {'teticima': ('tetika', 0)},
    7: {'centara': ('centra', 0), 'kustava': ('kustva', 0), 'tvenici':
        ('tvenik', 0)},
    6: {'atcima': ('atka', 0), 'avilan': ('avilni', 0), 'centar': ('centra',
        0), 'inzima': ('ing', 0), 'istara': ('istra', 0), 'jacima': ('jak',
        0), 'lozima': ('loga', 0), 'metara': ('metra', 0), 'nicima': ('nik',
        0), 'nstava': ('nstva', 0), 'pesima': ('peh', 0), 'pletan':
        ('pletni', 0), 'pravan': ('pravni', 0), 'stavan': ('stavni', 0),
        'tetici': ('tetika', 0), 'ticima': ('tik', 0), 'utcima': ('utka',
        0), 'voljan': ('voljni', 0), 'zicima': ('zik', 0)},
    5: {'acaka': ('acka', 1), 'ajaca': ('ajca', 0), 'ajaka': ('ajka', 0),
        'alaca': ('alca', 0), 'anaka': ('anki', 0), 'anata': ('anta', 0),
        'anjac': ('anjca', 0), 'antan': ('antni', 0), 'ataka': ('atka', 0),
        'ačaka': ('ačka', 0), 'bilan': ('bilni', 0), 'bojci': ('bojka', 0),
        'cajan': ('cajni', 1), 'dusan': ('dusni', 1), 'dušan': ('dušni', 0),
        'ejaca': ('ejca', 0), 'ekata': ('ekta', 0), 'elaca': ('elca', 0),
        'esama': ('esma', 0), 'eskan': ('eskna', 0), 'etaka': ('etka', 0),
        'gilan': ('gilni', 0), 'istar': ('istra', 0), 'itaka': ('itka', 0),
        'izama': ('izma', 0), 'kusan': ('kusni', 0), 'laran': ('larni', 0),
        'ljaca': ('ljca', 0), 'metar': ('metra', 0), 'nilan': ('nilni', 0),
        'njaca': ('njca', 0), 'ojaca': ('ojca', 0), 'ojaka': ('ojka', 0),
        'ojsci': ('ojska', 0), 'olaca': ('olca', 0), 'otaka': ('otka', 0),
        'rilan': ('rilni', 0), 'silan': ('silni', 0), 'sivan': ('sivni', 0),
        'snici': ('snik', 0), 'tetan': ('tetni', 0), 'tican': ('ticni', 1),
        'tilan': ('tilni', 0), 'tivan': ('tivni', 0), 'tičan': ('tični', 0),
        'utaka': ('utka', 0), 'vojci': ('vojka', 0), 'čajan': ('čajni', 0),
        'čcima': ('čka', 0)},
    4: {'acak': ('acka', 1), 'ajac': ('ajca', 0), 'alac': ('alca', 0),
        'alan': ('alni', 0), 'aoca': ('alca', 0), 'asan': ('asni', 1),
        'atak': ('atka', 0), 'atan': ('atni', 0), 'atci': ('atka', 0),
        'ačak': ('ačka', 0), 'ašan': ('ašni', 0), 'baci': ('baci', 0),
        'daba': ('dba', 0), 'ejac': ('ejca', 0), 'ekat': ('ekta', 0),
        'elac': ('elca', 0), 'enat': ('enta', 0), 'eran': ('erni', 0),
        'esan': ('esni', 0), 'etak': ('etka', 0), 'inzi': ('ing', 0),
        'itak': ('itka', 0), 'itci': ('itka', 0), 'izam': ('izma', 0),
        'jaci': ('jak', 0), 'jebe': ('jebi', 0), 'kuse': ('kusi', 0),
        'ljac': ('ljca', 0), 'lozi': ('loga', 0), 'maca': ('mca', 0),
        'naca': ('nca', 0), 'njac': ('njca', 0), 'ojac': ('ojca', 0),
        'olac': ('olca', 0), 'olce': ('olca', 0), 'oscu': ('osti', 1),
        'otak': ('otka', 0), 'ozan': ('ozni', 0), 'ošću': ('osti', 0),
        'pesi': ('peh', 0), 'raca': ('rca', 0), 'rave': ('ravi', 0), 'saca':
        ('sca', 0), 'save': ('savi', 1), 'usak': ('uska', 1), 'utak':
        ('utka', 0), 'utci': ('utka', 0), 'ušak': ('uška', 0), 'vaca':
        ('vca', 0), 'šaca': ('šca', 0), 'šave': ('šavi', 0)},
    3: {'mac': ('mca', 0), 'nac': ('nca', 0), 'rac': ('rca', 0), 'sac':
        ('sca', 0), 'vac': ('vca', 0), 'čci': ('čka', 0), 'šac': ('šca',
        0)},
}

_SR_STEP2 = {
    9: {'astadosmo': ('asta', 0), 'astadoste': ('asta', 0), 'astajasmo':
        ('astaj', 0), 'astajaste': ('astaj', 0), 'evitijega': ('evit', 0),
        'evitijemu': ('evit', 0), 'evitijima': ('evit', 0), 'istadosmo':
        ('ista', 0), 'istadoste': ('ista', 0), 'istajasmo': ('istaj', 0),
        'istajaste': ('istaj', 0), 'ostadosmo': ('osta', 0), 'ostadoste':
        ('osta', 0), 'ostajasmo': ('ostaj', 0), 'ostajaste': ('ostaj', 0),
        'ovitijega': ('ovit', 0), 'ovitijemu': ('ovit', 0), 'ovitijima':
        ('ovit', 0)},
    8: {'anjijega': ('anj', 0), 'anjijemu': ('anj', 0), 'anjijima': ('anj',
        0), 'astademo': ('asta', 0), 'astadete': ('asta', 0), 'astadose':
        ('asta', 1), 'astadoše': ('asta', 0), 'astajahu': ('astaj', 0),
        'astajala': ('astaj', 0), 'astajale': ('astaj', 0), 'astajali':
        ('astaj', 0), 'astajalo': ('astaj', 0), 'astajase': ('astaj', 1),
        'astajati': ('astaj', 0), 'astajaše': ('astaj', 0), 'astajemo':
        ('astaj', 0), 'astajete': ('astaj', 0), 'astajuci': ('astaj', 1),
        'astajući': ('astaj', 0), 'astanemo': ('asta', 0), 'astanete':
        ('asta', 0), 'astanila': ('asta', 0), 'astanimo': ('asta', 0),
        'astanite': ('asta', 0), 'astijega': ('ast', 0), 'astijemu': ('ast',
        0), 'astijima': ('ast', 0), 'cajevima': ('caj', 0), 'enjijega':
        ('enj', 0), 'enjijemu': ('enj', 0), 'enjijima': ('enj', 0),
        'evitijeg': ('evit', 0), 'evitijem': ('evit', 0), 'evitijih':
        ('evit', 0), 'evitijim': ('evit', 0), 'evitijoj': ('evit', 0),
        'ganijama': ('ganij', 0), 'ganijima': ('ganij', 0), 'istademo':
        ('ista', 0), 'istadete': ('ista', 0), 'istadose': ('ista', 1),
        'istadoše': ('ista', 0), 'istajahu': ('istaj', 0), 'istajala':
        ('istaj', 0), 'istajale': ('istaj', 0), 'istajali': ('istaj', 0),
        'istajalo': ('istaj', 0), 'istajase': ('istaj', 1), 'istajati':
        ('istaj', 0), 'istajaše': ('istaj', 0), 'istajemo': ('istaj', 0),
        'istajete': ('istaj', 0), 'istajuci': ('istaj', 1), 'istajući':
        ('istaj', 0), 'istanemo': ('ista', 0), 'istanete': ('ista', 0),
        'istanila': ('ista', 0), 'istanimo': ('ista', 0), 'istanite':
        ('ista', 0), 'lajevima': ('laj', 0), 'lucujemo': ('luc', 1),
        'lucujete': ('luc', 1), 'lucujuci': ('luc', 1), 'lučujemo': ('luč',
        0), 'lučujete': ('luč', 0), 'lučujući': ('luč', 0), 'manijama':
        ('manij', 0), 'manijima': ('manij', 0), 'ostademo': ('osta', 0),
        'ostadete': ('osta', 0), 'ostadose': ('osta', 1), 'ostadoše':
        ('osta', 0), 'ostajahu': ('ostaj', 0), 'ostajala': ('ostaj', 0),
        'ostajale': ('ostaj', 0), 'ostajali': ('ostaj', 0), 'ostajalo':
        ('ostaj', 0), 'ostajase': ('ostaj', 1), 'ostajati': ('ostaj', 0),
        'ostajaše': ('ostaj', 0), 'ostajemo': ('ostaj', 0), 'ostajete':
        ('ostaj', 0), 'ostajuci': ('ostaj', 1), 'ostajući': ('ostaj', 0),
        'ostanemo': ('osta', 0), 'ostanete': ('osta', 0), 'ostanila':
        ('osta', 0), 'ostanimo': ('osta', 0), 'ostanite': ('osta', 0),
        'ovitijeg': ('ovit', 0), 'ovitijem': ('ovit', 0), 'ovitijih':
        ('ovit', 0), 'ovitijim': ('ovit', 0), 'ovitijoj': ('ovit', 0),
        'panijama': ('panij', 0), 'panijima': ('panij', 0), 'rajevima':
        ('raj', 0), 'ranijama': ('ranij', 0), 'ranijima': ('ranij', 0),
        'snjijega': ('snj', 1), 'snjijemu': ('snj', 1), 'snjijima': ('snj',
        1), 'tanijama': ('tanij', 0), 'tanijima': ('tanij', 0), 'ćajevima':
        ('ćaj', 0), 'čajevima': ('čaj', 0), 'đajevima': ('đaj', 0),
        'šnjijega': ('šnj', 0), 'šnjijemu': ('šnj', 0), 'šnjijima': ('šnj',
        0)},
    7: {'ajevima': ('aj', 0), 'anjijeg': ('anj', 0), 'anjijem': ('anj', 0),
        'anjijih': ('anj', 0), 'anjijim': ('anj', 0), 'anjijoj': ('anj', 0),
        'astadem': ('asta', 0), 'astades': ('asta', 1), 'astadeš': ('asta',
        0), 'astadoh': ('asta', 0), 'astajah': ('astaj', 0), 'astajao':
        ('astaj', 0), 'astajat': ('astaj', 0), 'astajem': ('astaj', 0),
        'astajes': ('astaj', 1), 'astaješ': ('astaj', 0), 'astajmo':
        ('astaj', 0), 'astajte': ('astaj', 0), 'astanem': ('asta', 0),
        'astanes': ('asta', 1), 'astaneš': ('asta', 0), 'astavsi': ('asta',
        1), 'astavši': ('asta', 0), 'astijeg': ('ast', 0), 'astijem':
        ('ast', 0), 'astijih': ('ast', 0), 'astijim': ('ast', 0), 'astijoj':
        ('ast', 0), 'atijega': ('at', 0), 'atijemu': ('at', 0), 'atijima':
        ('at', 0), 'avajuci': ('ava', 1), 'avajući': ('ava', 0), 'avijega':
        ('av', 0), 'avijemu': ('av', 0), 'avijima': ('av', 0), 'elijega':
        ('el', 0), 'elijemu': ('el', 0), 'elijima': ('el', 0), 'enjijeg':
        ('enj', 0), 'enjijem': ('enj', 0), 'enjijih': ('enj', 0), 'enjijim':
        ('enj', 0), 'enjijoj': ('enj', 0), 'evajuci': ('eva', 1), 'evajući':
        ('eva', 0), 'evijega': ('ev', 0), 'evijemu': ('ev', 0), 'evijima':
        ('ev', 0), 'evitega': ('evit', 0), 'evitemu': ('evit', 0),
        'evitija': ('evit', 0), 'evitije': ('evit', 0), 'evitiji': ('evit',
        0), 'evitima': ('evit', 0), 'evitoga': ('evit', 0), 'evitome':
        ('evit', 0), 'evitomu': ('evit', 0), 'ganijom': ('ganij', 0),
        'ijalama': ('ijal', 0), 'ijalima': ('ijal', 0), 'ikatima': ('ikat',
        0), 'injasmo': ('inj', 0), 'injaste': ('inj', 0), 'irajuci': ('ir',
        1), 'irajući': ('ir', 0), 'irujemo': ('ir', 0), 'irujete': ('ir',
        0), 'irujuci': ('ir', 1), 'irujući': ('ir', 0), 'istadem': ('ista',
        0), 'istades': ('ista', 1), 'istadeš': ('ista', 0), 'istadoh':
        ('ista', 0), 'istajah': ('istaj', 0), 'istajao': ('istaj', 0),
        'istajat': ('istaj', 0), 'istajem': ('istaj', 0), 'istajes':
        ('istaj', 1), 'istaješ': ('istaj', 0), 'istajmo': ('istaj', 0),
        'istajte': ('istaj', 0), 'istanem': ('ista', 0), 'istanes': ('ista',
        1), 'istaneš': ('ista', 0), 'istavsi': ('ista', 1), 'istavši':
        ('ista', 0), 'ivajuci': ('iva', 1), 'ivajući': ('iva', 0),
        'ivijega': ('iv', 0), 'ivijemu': ('iv', 0), 'ivijima': ('iv', 0),
        'jetismo': ('jeti', 0), 'jetiste': ('jeti', 0), 'lucismo': ('luc',
        1), 'luciste': ('luc', 1), 'lucujem': ('luc', 1), 'lucujes': ('luc',
        1), 'lucujmo': ('luc', 1), 'lucujte': ('luc', 1), 'lučismo': ('luč',
        0), 'lučiste': ('luč', 0), 'lučujem': ('luč', 0), 'lučuješ': ('luč',
        0), 'lučujmo': ('luč', 0), 'lučujte': ('luč', 0), 'manijom':
        ('manij', 0), 'olovima': ('olov', 0), 'onovima': ('on', 0),
        'osijega': ('os', 1), 'osijemu': ('os', 1), 'osijima': ('os', 1),
        'ostadem': ('osta', 0), 'ostades': ('osta', 1), 'ostadeš': ('osta',
        0), 'ostadoh': ('osta', 0), 'ostajah': ('ostaj', 0), 'ostajao':
        ('ostaj', 0), 'ostajat': ('ostaj', 0), 'ostajem': ('ostaj', 0),
        'ostajes': ('ostaj', 1), 'ostaješ': ('ostaj', 0), 'ostajmo':
        ('ostaj', 0), 'ostajte': ('ostaj', 0), 'ostanem': ('osta', 0),
        'ostanes': ('osta', 1), 'ostaneš': ('osta', 0), 'ostavsi': ('osta',
        1), 'ostavši': ('osta', 0), 'ovijega': ('ov', 0), 'ovijemu': ('ov',
        0), 'ovijima': ('ov', 0), 'ovitega': ('ovit', 0), 'ovitemu':
        ('ovit', 0), 'ovitija': ('ovit', 0), 'ovitije': ('ovit', 0),
        'ovitiji': ('ovit', 0), 'ovitima': ('ovit', 0), 'ovitoga': ('ovit',
        0), 'ovitome': ('ovit', 0), 'ovitomu': ('ovit', 0), 'ozilima':
        ('ozil', 0), 'ošijega': ('oš', 0), 'ošijemu': ('oš', 0), 'ošijima':
        ('oš', 0), 'panijom': ('panij', 0), 'ranijom': ('ranij', 0),
        'rarijem': ('rari', 0), 'rosismo': ('rosi', 1), 'rosiste': ('rosi',
        1), 'rosivsi': ('rosi', 1), 'rošismo': ('roši', 0), 'rošiste':
        ('roši', 0), 'rošivši': ('roši', 0), 'skijega': ('sk', 0),
        'skijemu': ('sk', 0), 'skijima': ('sk', 0), 'snjijeg': ('snj', 1),
        'snjijem': ('os', 1), 'snjijih': ('snj', 1), 'snjijim': ('snj', 1),
        'snjijoj': ('snj', 1), 'tanijom': ('tanij', 0), 'ugovima': ('ugov',
        0), 'urajuci': ('ur', 1), 'urajući': ('ur', 0), 'uvajuci': ('uva',
        1), 'uvajući': ('uva', 0), 'škijega': ('šk', 0), 'škijemu': ('šk',
        0), 'škijima': ('šk', 0), 'šnjijeg': ('šnj', 0), 'šnjijem': ('šnj',
        0), 'šnjijih': ('šnj', 0), 'šnjijim': ('šnj', 0), 'šnjijoj': ('šnj',
        0)},
    6: {'acasmo': ('aca', 1), 'acaste': ('aca', 1), 'acavsi': ('aca', 1),
        'acismo': ('ac', 1), 'aciste': ('ac', 1), 'aninom': ('an', 0),
        'anjega': ('anj', 0), 'anjemu': ('anj', 0), 'anjija': ('anj', 0),
        'anjije': ('anj', 0), 'anjiji': ('anj', 0), 'anjiju': ('anj', 0),
        'anjima': ('anj', 0), 'anjoga': ('anj', 0), 'anjome': ('anj', 0),
        'anjomu': ('anj', 0), 'astade': ('asta', 0), 'astadu': ('asta', 0),
        'astaje': ('astaj', 0), 'astaju': ('astaj', 0), 'astala': ('asta',
        0), 'astale': ('asta', 0), 'astali': ('asta', 0), 'astalo': ('asta',
        0), 'astane': ('asta', 0), 'astanu': ('asta', 0), 'astati': ('asta',
        0), 'astega': ('ast', 0), 'astemo': ('as', 0), 'astemu': ('ast', 0),
        'astete': ('as', 0), 'astija': ('ast', 0), 'astije': ('ast', 0),
        'astiji': ('ast', 0), 'astima': ('ast', 0), 'astimo': ('as', 0),
        'astite': ('as', 0), 'astoga': ('ast', 0), 'astome': ('ast', 0),
        'astomu': ('ast', 0), 'astuci': ('as', 1), 'astući': ('as', 0),
        'atijeg': ('at', 0), 'atijem': ('at', 0), 'atijih': ('at', 0),
        'atijim': ('at', 0), 'avajmo': ('ava', 0), 'avajte': ('ava', 0),
        'avasmo': ('ava', 0), 'avaste': ('ava', 0), 'avijeg': ('av', 0),
        'avijem': ('av', 0), 'avijih': ('av', 0), 'avijim': ('av', 0),
        'avijoj': ('av', 0), 'ačasmo': ('ača', 0), 'ačaste': ('ača', 0),
        'ačavši': ('ača', 0), 'ačismo': ('ač', 0), 'ačiste': ('ač', 0),
        'basama': ('bas', 1), 'basima': ('bas', 1), 'bašama': ('baš', 0),
        'bašima': ('baš', 0), 'bijama': ('bij', 0), 'bijima': ('bij', 0),
        'cajama': ('caj', 0), 'cajeva': ('caj', 0), 'cajeve': ('caj', 0),
        'cajevi': ('caj', 0), 'cajima': ('caj', 0), 'cijama': ('cij', 0),
        'cijima': ('cij', 0), 'cinama': ('cin', 1), 'cinima': ('cin', 1),
        'cinoga': ('cin', 1), 'cinome': ('cin', 1), 'cinomu': ('cin', 1),
        'dijama': ('dij', 0), 'dijima': ('dij', 0), 'elijeg': ('el', 0),
        'elijem': ('el', 0), 'elijih': ('el', 0), 'elijim': ('el', 0),
        'elijoj': ('el', 0), 'enjega': ('enj', 0), 'enjemu': ('enj', 0),
        'enjija': ('enj', 0), 'enjije': ('enj', 0), 'enjiji': ('enj', 0),
        'enjiju': ('enj', 0), 'enjima': ('enj', 0), 'enjoga': ('enj', 0),
        'enjome': ('enj', 0), 'enjomu': ('enj', 0), 'estama': ('est', 0),
        'estima': ('est', 0), 'etavsi': ('et', 1), 'etavši': ('et', 0),
        'evajmo': ('eva', 0), 'evajte': ('eva', 0), 'evasmo': ('eva', 0),
        'evaste': ('eva', 0), 'evijeg': ('ev', 0), 'evijem': ('ev', 0),
        'evijih': ('ev', 0), 'evijim': ('ev', 0), 'evijoj': ('ev', 0),
        'evitem': ('evit', 0), 'evitih': ('evit', 0), 'evitim': ('evit', 0),
        'evitog': ('evit', 0), 'evitoj': ('evit', 0), 'evitom': ('evit', 0),
        'fijama': ('fij', 0), 'fijima': ('fij', 0), 'ganija': ('ganij', 0),
        'ganije': ('ganij', 0), 'ganiji': ('ganij', 0), 'ganiju': ('ganij',
        0), 'gasama': ('gas', 1), 'gasima': ('gas', 1), 'gašama': ('gaš',
        0), 'gašima': ('gaš', 0), 'gijama': ('gij', 0), 'gijima': ('gij',
        0), 'govima': ('g', 0), 'ijalom': ('ijal', 0), 'ikatom': ('ikat',
        0), 'injahu': ('inj', 0), 'injala': ('inj', 0), 'injale': ('inj',
        0), 'injali': ('inj', 0), 'injalo': ('inj', 0), 'injase': ('inj',
        1), 'injati': ('inj', 0), 'injaše': ('inj', 0), 'injemo': ('inj',
        0), 'injete': ('inj', 0), 'irasmo': ('ir', 0), 'iraste': ('ir', 0),
        'iravsi': ('ir', 1), 'iravši': ('ir', 0), 'irivat': ('ir', 0),
        'irujem': ('ir', 0), 'irujes': ('ir', 1), 'iruješ': ('ir', 0),
        'irujmo': ('ir', 0), 'irujte': ('ir', 0), 'istade': ('ista', 0),
        'istadu': ('ista', 0), 'istaje': ('istaj', 0), 'istaju': ('istaj',
        0), 'istala': ('ista', 0), 'istale': ('ista', 0), 'istali': ('ista',
        0), 'istalo': ('ista', 0), 'istama': ('ist', 0), 'istane': ('ista',
        0), 'istanu': ('ista', 0), 'istati': ('ista', 0), 'istima': ('ist',
        0), 'ivajmo': ('iva', 0), 'ivajte': ('iva', 0), 'ivasmo': ('iva',
        0), 'ivaste': ('iva', 0), 'ivijeg': ('iv', 0), 'ivijem': ('iv', 0),
        'ivijih': ('iv', 0), 'ivijim': ('iv', 0), 'ivijoj': ('iv', 0),
        'ištima': ('išt', 0), 'jasama': ('jas', 1), 'jasima': ('jas', 1),
        'jašama': ('jaš', 0), 'jašima': ('jaš', 0), 'jetila': ('jeti', 0),
        'jetile': ('jeti', 0), 'jetili': ('jeti', 0), 'jetilo': ('jeti', 0),
        'jetimo': ('jeti', 0), 'jetise': ('jeti', 1), 'jetite': ('jeti', 0),
        'jetiti': ('jeti', 0), 'jetiše': ('jeti', 0), 'kasama': ('kas', 1),
        'kasima': ('kas', 1), 'kašama': ('kaš', 0), 'kašima': ('kaš', 0),
        'kijega': ('k', 0), 'kijemu': ('k', 0), 'kijima': ('k', 0),
        'kstama': ('kst', 0), 'kstima': ('kst', 0), 'lajama': ('laj', 0),
        'lajeva': ('laj', 0), 'lajeve': ('laj', 0), 'lajevi': ('laj', 0),
        'lajima': ('laj', 0), 'latima': ('lat', 0), 'lemama': ('lem', 0),
        'lemima': ('lem', 0), 'lijama': ('lij', 0), 'lijima': ('lij', 0),
        'logama': ('log', 0), 'lovima': ('lov', 0), 'lucena': ('luc', 1),
        'lucene': ('luc', 1), 'luceni': ('luc', 1), 'luceno': ('luc', 1),
        'lucila': ('luc', 1), 'lucile': ('luc', 1), 'lucili': ('luc', 1),
        'lucilo': ('luc', 1), 'lucimo': ('luc', 1), 'lucise': ('luc', 1),
        'lucite': ('luc', 1), 'luciti': ('luc', 1), 'lucuje': ('luc', 1),
        'lucuju': ('luc', 1), 'lučena': ('luč', 0), 'lučene': ('luč', 0),
        'lučeni': ('luč', 0), 'lučeno': ('luč', 0), 'lučila': ('luč', 0),
        'lučile': ('luč', 0), 'lučili': ('luč', 0), 'lučilo': ('luč', 0),
        'lučimo': ('luč', 0), 'lučite': ('luč', 0), 'lučiti': ('luč', 0),
        'lučiše': ('luč', 0), 'lučuje': ('luč', 0), 'lučuju': ('luč', 0),
        'manija': ('manij', 0), 'manije': ('manij', 0), 'maniji': ('manij',
        0), 'maniju': ('manij', 0), 'mijama': ('mij', 0), 'mijima': ('mij',
        0), 'movima': ('mov', 0), 'nalama': ('nal', 0), 'nalima': ('nal',
        0), 'nasama': ('nas', 1), 'nasima': ('nas', 1), 'našama': ('naš',
        0), 'našima': ('naš', 0), 'nijama': ('nij', 0), 'nijega': ('n', 0),
        'nijemu': ('n', 0), 'nijima': ('n', 0), 'osijeg': ('os', 1),
        'osijem': ('os', 1), 'osijih': ('os', 1), 'osijim': ('os', 1),
        'osijoj': ('os', 1), 'ostade': ('osta', 0), 'ostadu': ('osta', 0),
        'ostaje': ('ostaj', 0), 'ostaju': ('ostaj', 0), 'ostala': ('osta',
        0), 'ostale': ('osta', 0), 'ostali': ('osta', 0), 'ostalo': ('osta',
        0), 'ostama': ('ost', 0), 'ostane': ('osta', 0), 'ostanu': ('osta',
        0), 'ostati': ('osta', 0), 'ostima': ('ost', 0), 'otijem': ('oti',
        0), 'ovasmo': ('ova', 0), 'ovaste': ('ova', 0), 'ovijeg': ('ov', 0),
        'ovijem': ('ov', 0), 'ovijih': ('ov', 0), 'ovijim': ('ov', 0),
        'ovijoj': ('ov', 0), 'ovitem': ('ovit', 0), 'ovitih': ('ovit', 0),
        'ovitim': ('ovit', 0), 'ovitog': ('ovit', 0), 'ovitoj': ('ovit', 0),
        'ovitom': ('ovit', 0), 'ozilom': ('ozil', 0), 'ošijeg': ('oš', 0),
        'ošijem': ('oš', 0), 'ošijih': ('oš', 0), 'ošijim': ('oš', 0),
        'ošijoj': ('oš', 0), 'panija': ('panij', 0), 'panije': ('panij', 0),
        'paniji': ('panij', 0), 'paniju': ('panij', 0), 'pijama': ('pij',
        0), 'pijima': ('pij', 0), 'rajama': ('raj', 0), 'rajeva': ('raj',
        0), 'rajeve': ('raj', 0), 'rajevi': ('raj', 0), 'rajima': ('raj',
        0), 'ramama': ('ram', 0), 'ranija': ('ranij', 0), 'ranije':
        ('ranij', 0), 'raniji': ('ranij', 0), 'raniju': ('ranij', 0),
        'rarija': ('rari', 0), 'rariju': ('rari', 0), 'rijama': ('rij', 0),
        'rijima': ('rij', 0), 'rosila': ('rosi', 1), 'rosile': ('rosi', 1),
        'rosili': ('rosi', 1), 'rosilo': ('rosi', 1), 'rosimo': ('rosi', 1),
        'rosise': ('rosi', 1), 'rosite': ('rosi', 1), 'rositi': ('rosi', 1),
        'rošila': ('roši', 0), 'rošile': ('roši', 0), 'rošili': ('roši', 0),
        'rošilo': ('roši', 0), 'rošimo': ('roši', 0), 'rošite': ('roši', 0),
        'rošiti': ('roši', 0), 'rošiše': ('roši', 0), 'sijama': ('sij', 0),
        'sijima': ('sij', 0), 'skijeg': ('sk', 0), 'skijem': ('sk', 0),
        'skijih': ('sk', 0), 'skijim': ('sk', 0), 'skijoj': ('sk', 0),
        'snjega': ('snj', 1), 'snjemu': ('snj', 1), 'snjija': ('snj', 1),
        'snjije': ('snj', 1), 'snjiji': ('snj', 1), 'snjiju': ('snj', 1),
        'snjima': ('snj', 1), 'snjoga': ('snj', 1), 'snjome': ('snj', 1),
        'snjomu': ('snj', 1), 'stvima': ('stv', 0), 'tanija': ('tanij', 0),
        'tanije': ('tanij', 0), 'taniji': ('tanij', 0), 'taniju': ('tanij',
        0), 'tasama': ('tas', 1), 'tasima': ('tas', 1), 'tašama': ('taš',
        0), 'tašima': ('taš', 0), 'tijama': ('tij', 0), 'tijima': ('tij',
        0), 'urajmo': ('ur', 0), 'urajte': ('ur', 0), 'urasmo': ('ur', 0),
        'uraste': ('ur', 0), 'uvajmo': ('uva', 0), 'uvajte': ('uva', 0),
        'uvasmo': ('uva', 0), 'uvaste': ('uva', 0), 'vasama': ('vas', 1),
        'vasima': ('vas', 1), 'vašama': ('vaš', 0), 'vašima': ('vaš', 0),
        'zijama': ('zij', 0), 'zijima': ('zij', 0), 'ćajama': ('ćaj', 0),
        'ćajeva': ('ćaj', 0), 'ćajeve': ('ćaj', 0), 'ćajevi': ('ćaj', 0),
        'ćajima': ('ćaj', 0), 'čajama': ('čaj', 0), 'čajeva': ('čaj', 0),
        'čajeve': ('čaj', 0), 'čajevi': ('čaj', 0), 'čajima': ('čaj', 0),
        'činama': ('čin', 0), 'činima': ('čin', 0), 'činoga': ('čin', 0),
        'činome': ('čin', 0), 'činomu': ('čin', 0), 'đajama': ('đaj', 0),
        'đajeva': ('đaj', 0), 'đajeve': ('đaj', 0), 'đajevi': ('đaj', 0),
        'đajima': ('đaj', 0), 'škijeg': ('šk', 0), 'škijem': ('šk', 0),
        'škijih': ('šk', 0), 'škijim': ('šk', 0), 'škijoj': ('šk', 0),
        'šnjega': ('šnj', 0), 'šnjemu': ('šnj', 0), 'šnjija': ('šnj', 0),
        'šnjije': ('šnj', 0), 'šnjiji': ('šnj', 0), 'šnjiju': ('šnj', 0),
        'šnjima': ('šnj', 0), 'šnjoga': ('šnj', 0), 'šnjome': ('šnj', 0),
        'šnjomu': ('šnj', 0), 'štvima': ('štv', 0), 'žijama': ('žij', 0),
        'žijima': ('žij', 0)},
    5: {'acahu': ('aca', 1), 'acaju': ('aca', 1), 'acala': ('aca', 1),
        'acale': ('aca', 1), 'acali': ('aca', 1), 'acalo': ('aca', 1),
        'acamo': ('aca', 1), 'acana': ('aca', 1), 'acane': ('aca', 1),
        'acani': ('aca', 1), 'acano': ('aca', 1), 'acase': ('aca', 1),
        'acate': ('aca', 1), 'acati': ('aca', 1), 'aceci': ('ac', 1),
        'acega': ('ac', 1), 'acemu': ('ac', 1), 'acena': ('ac', 1), 'acene':
        ('ac', 1), 'aceni': ('ac', 1), 'aceno': ('ac', 1), 'acila': ('ac',
        1), 'acile': ('ac', 1), 'acili': ('ac', 1), 'acilo': ('ac', 1),
        'acima': ('ac', 1), 'acimo': ('ac', 1), 'acise': ('ac', 1), 'acite':
        ('ac', 1), 'aciti': ('ac', 1), 'acoga': ('ac', 1), 'acome': ('ac',
        1), 'acomu': ('ac', 1), 'ajama': ('aj', 0), 'ajeva': ('aj', 0),
        'ajeve': ('aj', 0), 'ajevi': ('aj', 0), 'ajima': ('aj', 0), 'ajuci':
        ('a', 1), 'ajući': ('a', 0), 'alama': ('a', 0), 'alima': ('a', 0),
        'anega': ('an', 0), 'anemu': ('an', 0), 'anima': ('an', 0), 'anina':
        ('an', 0), 'anine': ('an', 0), 'aninu': ('an', 0), 'anjeg': ('anj',
        0), 'anjem': ('anj', 0), 'anjih': ('anj', 0), 'anjim': ('anj', 0),
        'anjog': ('anj', 0), 'anjoj': ('anj', 0), 'anjom': ('anj', 0),
        'arama': ('ar', 0), 'arima': ('ar', 0), 'astao': ('asta', 0),
        'astat': ('asta', 0), 'astem': ('ast', 0), 'astes': ('as', 1),
        'asteš': ('as', 0), 'astih': ('ast', 0), 'astim': ('ast', 0),
        'astog': ('ast', 0), 'astoj': ('ast', 0), 'astom': ('ast', 0),
        'atega': ('at', 0), 'atemu': ('at', 0), 'atija': ('at', 0), 'atije':
        ('at', 0), 'atiji': ('at', 0), 'atiju': ('at', 0), 'atima': ('at',
        0), 'atoga': ('at', 0), 'atome': ('at', 0), 'atomu': ('at', 0),
        'avahu': ('ava', 0), 'avaju': ('ava', 0), 'avala': ('ava', 0),
        'avale': ('ava', 0), 'avali': ('ava', 0), 'avalo': ('ava', 0),
        'avama': ('av', 0), 'avamo': ('ava', 0), 'avana': ('ava', 0),
        'avane': ('ava', 0), 'avani': ('ava', 0), 'avano': ('ava', 0),
        'avase': ('ava', 1), 'avate': ('ava', 0), 'avati': ('ava', 0),
        'avaše': ('ava', 0), 'avega': ('av', 0), 'avemu': ('av', 0),
        'avija': ('av', 0), 'avije': ('av', 0), 'aviji': ('av', 0), 'aviju':
        ('av', 0), 'avima': ('av', 0), 'avoga': ('av', 0), 'avome': ('av',
        0), 'avomu': ('av', 0), 'aćega': ('ać', 0), 'aćemu': ('ać', 0),
        'aćima': ('ać', 0), 'aćoga': ('ać', 0), 'aćome': ('ać', 0), 'aćomu':
        ('ać', 0), 'ačahu': ('ača', 0), 'ačaju': ('ača', 0), 'ačala':
        ('ača', 0), 'ačale': ('ača', 0), 'ačali': ('ača', 0), 'ačalo':
        ('ača', 0), 'ačamo': ('ača', 0), 'ačana': ('ača', 0), 'ačane':
        ('ača', 0), 'ačani': ('ača', 0), 'ačano': ('ača', 0), 'ačate':
        ('ača', 0), 'ačati': ('ača', 0), 'ačaše': ('ača', 0), 'ačena':
        ('ač', 0), 'ačene': ('ač', 0), 'ačeni': ('ač', 0), 'ačeno': ('ač',
        0), 'ačeći': ('ač', 0), 'ačila': ('ač', 0), 'ačile': ('ač', 0),
        'ačili': ('ač', 0), 'ačilo': ('ač', 0), 'ačimo': ('ač', 0), 'ačite':
        ('ač', 0), 'ačiti': ('ač', 0), 'ačiše': ('ač', 0), 'basem': ('bas',
        1), 'basom': ('bas', 1), 'bašem': ('baš', 0), 'bašom': ('baš', 0),
        'bijom': ('bij', 0), 'cajem': ('caj', 0), 'cijom': ('cij', 0),
        'cinih': ('cin', 1), 'cinim': ('cin', 1), 'cinog': ('cin', 1),
        'cinoj': ('cin', 1), 'cinom': ('cin', 1), 'dijom': ('dij', 0),
        'drama': ('dr', 0), 'drima': ('dr', 0), 'ecega': ('ec', 1), 'ecemu':
        ('ec', 1), 'ecima': ('ec', 1), 'ecoga': ('ec', 1), 'ecome': ('ec',
        1), 'ecomu': ('ec', 1), 'elama': ('e', 0), 'elega': ('el', 0),
        'elemu': ('el', 0), 'elija': ('el', 0), 'elije': ('el', 0), 'eliji':
        ('el', 0), 'eliju': ('el', 0), 'elima': ('el', 0), 'eloga': ('el',
        0), 'elome': ('el', 0), 'elomu': ('el', 0), 'enega': ('en', 0),
        'enemu': ('en', 0), 'enjeg': ('enj', 0), 'enjem': ('enj', 0),
        'enjih': ('enj', 0), 'enjim': ('enj', 0), 'enjog': ('enj', 0),
        'enjoj': ('enj', 0), 'enjom': ('enj', 0), 'erama': ('er', 0),
        'erima': ('er', 0), 'esama': ('es', 1), 'esima': ('es', 0), 'estom':
        ('est', 0), 'etama': ('et', 0), 'etemo': ('et', 0), 'etima': ('et',
        0), 'etimo': ('et', 0), 'etuci': ('et', 1), 'etući': ('et', 0),
        'evahu': ('eva', 0), 'evaju': ('eva', 0), 'evala': ('eva', 0),
        'evale': ('eva', 0), 'evali': ('eva', 0), 'evalo': ('eva', 0),
        'evama': ('ev', 0), 'evamo': ('eva', 0), 'evana': ('eva', 0),
        'evane': ('eva', 0), 'evani': ('eva', 0), 'evano': ('eva', 0),
        'evase': ('eva', 1), 'evate': ('eva', 0), 'evati': ('eva', 0),
        'evaše': ('eva', 0), 'evega': ('ev', 0), 'evemu': ('ev', 0),
        'evija': ('ev', 0), 'evije': ('ev', 0), 'eviji': ('ev', 0), 'eviju':
        ('ev', 0), 'evima': ('ev', 0), 'evita': ('evit', 0), 'evite':
        ('evit', 0), 'eviti': ('evit', 0), 'evito': ('evit', 0), 'evitu':
        ('evit', 0), 'evoga': ('ev', 0), 'evome': ('ev', 0), 'evomu': ('ev',
        0), 'ećega': ('eć', 0), 'ećemu': ('eć', 0), 'ećima': ('eć', 0),
        'ećoga': ('eć', 0), 'ećome': ('eć', 0), 'ećomu': ('eć', 0), 'ešama':
        ('eš', 0), 'ešima': ('eš', 0), 'fijom': ('fij', 0), 'gasem': ('gas',
        1), 'gasom': ('gas', 1), 'gašem': ('gaš', 0), 'gašom': ('gaš', 0),
        'gijom': ('gij', 0), 'ijala': ('ijal', 0), 'ijale': ('ijal', 0),
        'ijali': ('ijal', 0), 'ijalo': ('ijal', 0), 'ijalu': ('ijal', 0),
        'ijemo': ('i', 0), 'ijete': ('i', 0), 'ikata': ('ikat', 0), 'ikate':
        ('ikat', 0), 'ikati': ('ikat', 0), 'ikato': ('ikat', 0), 'ikatu':
        ('ikat', 0), 'ilama': ('i', 0), 'ilima': ('i', 0), 'inama': ('in',
        0), 'inima': ('in', 0), 'injah': ('inj', 0), 'injao': ('inj', 0),
        'injat': ('inj', 0), 'injem': ('inj', 0), 'injes': ('inj', 1),
        'inješ': ('inj', 0), 'irahu': ('ir', 0), 'iraju': ('ir', 0),
        'irala': ('ir', 0), 'irale': ('ir', 0), 'irali': ('ir', 0), 'iralo':
        ('ir', 0), 'iramo': ('ir', 0), 'irase': ('ir', 1), 'irate': ('ir',
        0), 'irati': ('ir', 0), 'iraše': ('ir', 0), 'iruje': ('ir', 0),
        'iruju': ('ir', 0), 'isama': ('is', 1), 'isima': ('is', 0), 'istao':
        ('ista', 0), 'istat': ('ista', 0), 'istem': ('ist', 1), 'istom':
        ('ist', 0), 'ivahu': ('iva', 0), 'ivaju': ('iva', 0), 'ivala':
        ('iva', 0), 'ivale': ('iva', 0), 'ivali': ('iva', 0), 'ivalo':
        ('iva', 0), 'ivama': ('iv', 0), 'ivamo': ('iva', 0), 'ivana':
        ('iva', 0), 'ivane': ('iva', 0), 'ivani': ('iva', 0), 'ivano':
        ('iva', 0), 'ivase': ('iva', 1), 'ivate': ('iva', 0), 'ivati':
        ('iva', 0), 'ivaše': ('iva', 0), 'ivega': ('iv', 0), 'ivemu': ('iv',
        0), 'ivija': ('iv', 0), 'ivije': ('iv', 0), 'iviji': ('iv', 0),
        'iviju': ('iv', 0), 'ivima': ('iv', 0), 'ivoga': ('iv', 0), 'ivome':
        ('iv', 0), 'ivomu': ('iv', 0), 'išama': ('iš', 0), 'išima': ('iš',
        0), 'ištem': ('išt', 0), 'jasem': ('jas', 1), 'jasom': ('jas', 1),
        'jašem': ('jaš', 0), 'jašom': ('jaš', 0), 'jetih': ('jeti', 0),
        'jetim': ('jeti', 0), 'jetio': ('jeti', 0), 'jetis': ('jeti', 1),
        'jetit': ('jeti', 0), 'jetiš': ('jeti', 0), 'kasem': ('kas', 1),
        'kasom': ('kas', 1), 'kašem': ('kaš', 0), 'kašom': ('kaš', 0),
        'kijeg': ('k', 0), 'kijem': ('k', 0), 'kijih': ('k', 0), 'kijim':
        ('k', 0), 'kijoj': ('k', 0), 'kstom': ('kst', 0), 'lajem': ('laj',
        0), 'latom': ('lat', 0), 'lemom': ('lem', 0), 'lijem': ('li', 0),
        'lijom': ('lij', 0), 'logom': ('log', 0), 'lovom': ('lov', 0),
        'lucen': ('luc', 1), 'lucih': ('luc', 1), 'lucim': ('luc', 1),
        'lucio': ('luc', 1), 'lucis': ('luc', 1), 'lucit': ('luc', 1),
        'lucuj': ('luc', 1), 'lučen': ('luč', 0), 'lučih': ('luč', 0),
        'lučim': ('luč', 0), 'lučio': ('luč', 0), 'lučit': ('luč', 0),
        'lučiš': ('luč', 0), 'lučuj': ('luč', 0), 'mijom': ('mij', 0),
        'movom': ('mov', 0), 'nalom': ('nal', 0), 'nasem': ('nas', 1),
        'nasom': ('nas', 1), 'našem': ('naš', 0), 'našom': ('naš', 0),
        'nijeg': ('n', 0), 'nijem': ('n', 0), 'nijih': ('n', 0), 'nijim':
        ('n', 0), 'nijoj': ('n', 0), 'nijom': ('nij', 0), 'nismo': ('ni',
        0), 'niste': ('ni', 0), 'nivsi': ('ni', 1), 'nivši': ('ni', 0),
        'nusmo': ('n', 0), 'nuste': ('n', 0), 'nuvsi': ('n', 1), 'nuvši':
        ('n', 0), 'olima': ('ol', 0), 'olova': ('olov', 0), 'olove':
        ('olov', 0), 'olovi': ('olov', 0), 'onima': ('on', 0), 'onova':
        ('on', 0), 'onove': ('on', 0), 'onovi': ('on', 0), 'orama': ('or',
        0), 'orima': ('or', 0), 'osega': ('os', 1), 'osemu': ('os', 1),
        'osija': ('os', 1), 'osije': ('os', 1), 'osiji': ('os', 1), 'osiju':
        ('os', 1), 'osima': ('os', 1), 'osoga': ('os', 1), 'osome': ('os',
        1), 'osomu': ('os', 1), 'ostao': ('osta', 0), 'ostat': ('osta', 0),
        'ostom': ('ost', 0), 'otija': ('oti', 0), 'otiju': ('oti', 0),
        'ovahu': ('ova', 0), 'ovala': ('ova', 0), 'ovale': ('ova', 0),
        'ovali': ('ova', 0), 'ovalo': ('ova', 0), 'ovase': ('ova', 1),
        'ovati': ('ova', 0), 'ovaše': ('ova', 0), 'ovega': ('ov', 0),
        'ovemu': ('ov', 0), 'ovija': ('ov', 0), 'ovije': ('ov', 0), 'oviji':
        ('ov', 0), 'oviju': ('ov', 0), 'ovima': ('ov', 0), 'ovita': ('ovit',
        0), 'ovite': ('ovit', 0), 'oviti': ('ovit', 0), 'ovito': ('ovit',
        0), 'ovitu': ('ovit', 0), 'ovoga': ('ov', 0), 'ovome': ('ov', 0),
        'ovomu': ('ov', 0), 'ozila': ('ozil', 0), 'ozile': ('ozil', 0),
        'ozili': ('ozil', 0), 'ozilu': ('ozil', 0), 'ošega': ('oš', 0),
        'ošemu': ('oš', 0), 'ošija': ('oš', 0), 'ošije': ('oš', 0), 'ošiji':
        ('oš', 0), 'ošiju': ('oš', 0), 'ošima': ('oš', 0), 'ošoga': ('oš',
        0), 'ošome': ('oš', 0), 'ošomu': ('oš', 0), 'pijom': ('pij', 0),
        'rajem': ('raj', 0), 'ramom': ('ram', 0), 'rario': ('rari', 0),
        'rijom': ('rij', 0), 'rosih': ('rosi', 1), 'rosim': ('rosi', 1),
        'rosio': ('rosi', 1), 'rosis': ('rosi', 1), 'rosit': ('rosi', 1),
        'roših': ('roši', 0), 'rošim': ('roši', 0), 'rošio': ('roši', 0),
        'rošit': ('roši', 0), 'rošiš': ('roši', 0), 'sijem': ('si', 0),
        'sijom': ('sij', 0), 'skega': ('sk', 0), 'skemu': ('sk', 0),
        'skija': ('sk', 0), 'skije': ('sk', 0), 'skiji': ('sk', 0), 'skima':
        ('sk', 0), 'skoga': ('sk', 0), 'skome': ('sk', 0), 'skomu': ('sk',
        0), 'snega': ('sn', 1), 'snemu': ('sn', 1), 'snjeg': ('snj', 1),
        'snjem': ('snj', 1), 'snjih': ('snj', 1), 'snjim': ('snj', 1),
        'snjog': ('snj', 1), 'snjoj': ('snj', 1), 'snjom': ('snj', 1),
        'stvom': ('stv', 0), 'tajmo': ('ta', 0), 'tajte': ('ta', 0),
        'tasem': ('tas', 1), 'tasmo': ('ta', 0), 'tasom': ('tas', 1),
        'taste': ('ta', 0), 'tavsi': ('ta', 1), 'tavši': ('ta', 0), 'tašem':
        ('taš', 0), 'tašom': ('taš', 0), 'tijom': ('tij', 0), 'ucega':
        ('uc', 1), 'ucemu': ('uc', 1), 'ucima': ('uc', 1), 'ucoga': ('uc',
        1), 'ucome': ('uc', 1), 'ucomu': ('uc', 1), 'ugama': ('ug', 0),
        'ugova': ('ugov', 0), 'ugove': ('ugov', 0), 'ugovi': ('ugov', 0),
        'ujemo': ('uj', 0), 'ujete': ('uj', 0), 'ujuci': ('uj', 1), 'ujući':
        ('uj', 0), 'urahu': ('ur', 0), 'uraju': ('ur', 0), 'urala': ('ur',
        0), 'urale': ('ur', 0), 'urali': ('ur', 0), 'uralo': ('ur', 0),
        'uramo': ('ur', 0), 'urana': ('ur', 0), 'urane': ('ur', 0), 'urani':
        ('ur', 0), 'urano': ('ur', 0), 'urase': ('ur', 1), 'urate': ('ur',
        0), 'urati': ('ur', 0), 'uraše': ('ur', 0), 'uvahu': ('uva', 0),
        'uvaju': ('uva', 0), 'uvala': ('uva', 0), 'uvale': ('uva', 0),
        'uvali': ('uva', 0), 'uvalo': ('uva', 0), 'uvamo': ('uva', 0),
        'uvana': ('uva', 0), 'uvane': ('uva', 0), 'uvani': ('uva', 0),
        'uvano': ('uva', 0), 'uvase': ('uva', 1), 'uvate': ('uva', 0),
        'uvati': ('uva', 0), 'uvaše': ('uva', 0), 'ućega': ('uć', 0),
        'ućemu': ('uć', 0), 'ućima': ('uć', 0), 'ućoga': ('uć', 0), 'ućome':
        ('uć', 0), 'ućomu': ('uć', 0), 'vasem': ('vas', 1), 'vasom': ('vas',
        1), 'vašem': ('vaš', 0), 'vašom': ('vaš', 0), 'zijom': ('zij', 0),
        'ćajem': ('ćaj', 0), 'čajem': ('čaj', 0), 'činih': ('čin', 0),
        'činim': ('čin', 0), 'činog': ('čin', 0), 'činoj': ('čin', 0),
        'činom': ('čin', 0), 'đajem': ('đaj', 0), 'škega': ('šk', 0),
        'škemu': ('šk', 0), 'škija': ('šk', 0), 'škije': ('šk', 0), 'škiji':
        ('šk', 0), 'škima': ('šk', 0), 'škoga': ('šk', 0), 'škome': ('šk',
        0), 'škomu': ('šk', 0), 'šnega': ('šn', 0), 'šnemu': ('šn', 0),
        'šnjeg': ('šnj', 0), 'šnjem': ('šnj', 0), 'šnjih': ('šnj', 0),
        'šnjim': ('šnj', 0), 'šnjog': ('šnj', 0), 'šnjoj': ('šnj', 0),
        'šnjom': ('šnj', 0), 'štvom': ('štv', 0), 'žijom': ('žij', 0)},
    4: {'acah': ('aca', 1), 'acam': ('aca', 1), 'acan': ('aca', 1), 'acao':
        ('aca', 1), 'acas': ('aca', 1), 'acat': ('aca', 1), 'aceg': ('ac',
        1), 'acem': ('ac', 1), 'acen': ('ac', 1), 'acih': ('ac', 1), 'acim':
        ('ac', 1), 'acio': ('ac', 1), 'acis': ('ac', 1), 'acit': ('ac', 1),
        'acog': ('ac', 1), 'acoj': ('ac', 1), 'acom': ('ac', 1), 'acuh':
        ('ac', 1), 'ajem': ('a', 0), 'ajmo': ('a', 0), 'ajte': ('a', 0),
        'aloj': ('a', 0), 'alom': ('a', 0), 'aneg': ('an', 0), 'anem':
        ('an', 0), 'anin': ('an', 0), 'anja': ('anj', 0), 'anje': ('anj',
        0), 'anji': ('anj', 0), 'anjo': ('anj', 0), 'anju': ('anj', 0),
        'anom': ('an', 0), 'arom': ('ar', 0), 'asla': ('as', 0), 'asle':
        ('as', 0), 'asli': ('as', 0), 'aslo': ('as', 0), 'asmo': ('a', 0),
        'asta': ('ast', 0), 'aste': ('ast', 0), 'asti': ('ast', 0), 'asto':
        ('ast', 0), 'astu': ('ast', 0), 'ateg': ('at', 0), 'atem': ('at',
        0), 'atih': ('at', 0), 'atim': ('at', 0), 'atog': ('at', 0), 'atoj':
        ('at', 0), 'atom': ('at', 0), 'avah': ('ava', 0), 'avaj': ('ava',
        0), 'avam': ('ava', 0), 'avan': ('ava', 0), 'avao': ('ava', 0),
        'avas': ('ava', 1), 'avat': ('ava', 0), 'avav': ('ava', 0), 'avaš':
        ('ava', 0), 'aveg': ('av', 0), 'avem': ('av', 0), 'avih': ('av', 0),
        'avim': ('av', 0), 'avog': ('av', 0), 'avoj': ('av', 0), 'avom':
        ('av', 0), 'avsi': ('a', 1), 'avši': ('a', 0), 'aćeg': ('ać', 0),
        'aćem': ('ać', 0), 'aćih': ('ać', 0), 'aćim': ('ać', 0), 'aćog':
        ('ać', 0), 'aćoj': ('ać', 0), 'aćom': ('ać', 0), 'aćuh': ('ać', 0),
        'ačah': ('ača', 0), 'ačam': ('ača', 0), 'ačan': ('ača', 0), 'ačao':
        ('ača', 0), 'ačat': ('ača', 0), 'ačaš': ('ača', 0), 'ačen': ('ač',
        0), 'ačih': ('ač', 0), 'ačim': ('ač', 0), 'ačio': ('ač', 0), 'ačit':
        ('ač', 0), 'ačiš': ('ač', 0), 'basa': ('bas', 1), 'base': ('bas',
        1), 'basi': ('bas', 1), 'basu': ('bas', 1), 'baša': ('baš', 0),
        'baše': ('baš', 0), 'baši': ('baš', 0), 'bašu': ('baš', 0), 'bija':
        ('bij', 0), 'bije': ('bij', 0), 'biji': ('bij', 0), 'bijo': ('bij',
        0), 'biju': ('bij', 0), 'caja': ('caj', 0), 'caje': ('caj', 0),
        'caji': ('caj', 0), 'caju': ('caj', 0), 'cija': ('cij', 0), 'cije':
        ('cij', 0), 'ciji': ('cij', 0), 'cijo': ('cij', 0), 'ciju': ('cij',
        0), 'cina': ('cin', 1), 'cine': ('cin', 1), 'cini': ('cin', 1),
        'cino': ('cin', 1), 'cinu': ('cin', 1), 'dija': ('dij', 0), 'dije':
        ('dij', 0), 'diji': ('dij', 0), 'dijo': ('dij', 0), 'diju': ('dij',
        0), 'drom': ('dr', 0), 'eceg': ('ec', 1), 'ecem': ('ec', 1), 'ecih':
        ('ec', 1), 'ecim': ('ec', 1), 'ecog': ('ec', 1), 'ecoj': ('ec', 1),
        'ecom': ('ec', 1), 'ecuh': ('ec', 1), 'eleg': ('el', 0), 'elem':
        ('el', 0), 'elih': ('el', 0), 'elim': ('el', 0), 'elog': ('el', 0),
        'eloj': ('el', 0), 'elom': ('el', 0), 'eneg': ('en', 0), 'enem':
        ('en', 0), 'enja': ('enj', 0), 'enje': ('enj', 0), 'enji': ('enj',
        0), 'enjo': ('enj', 0), 'enju': ('enj', 0), 'erom': ('er', 0),
        'esem': ('es', 1), 'esom': ('es', 0), 'esta': ('est', 0), 'este':
        ('est', 0), 'esti': ('est', 0), 'esto': ('est', 0), 'estu': ('est',
        0), 'etem': ('et', 0), 'etes': ('et', 1), 'eteš': ('et', 0), 'etom':
        ('et', 0), 'evah': ('eva', 0), 'evaj': ('eva', 0), 'evam': ('eva',
        0), 'evan': ('eva', 0), 'evao': ('eva', 0), 'evas': ('eva', 1),
        'evat': ('eva', 0), 'evav': ('eva', 0), 'evaš': ('eva', 0), 'eveg':
        ('ev', 0), 'evem': ('ev', 0), 'evih': ('ev', 0), 'evim': ('ev', 0),
        'evog': ('ev', 0), 'evoj': ('ev', 0), 'evom': ('ev', 0), 'ećeg':
        ('eć', 0), 'ećem': ('eć', 0), 'ećih': ('eć', 0), 'ećim': ('eć', 0),
        'ećog': ('eć', 0), 'ećoj': ('eć', 0), 'ećom': ('eć', 0), 'ećuh':
        ('eć', 0), 'ešem': ('eš', 0), 'ešom': ('eš', 0), 'fija': ('fij', 0),
        'fije': ('fij', 0), 'fiji': ('fij', 0), 'fijo': ('fij', 0), 'fiju':
        ('fij', 0), 'gama': ('g', 0), 'gasa': ('gas', 1), 'gase': ('gas',
        1), 'gasi': ('gas', 1), 'gasu': ('gas', 1), 'gaša': ('gaš', 0),
        'gaše': ('gaš', 0), 'gaši': ('gaš', 0), 'gašu': ('gaš', 0), 'gija':
        ('gij', 0), 'gije': ('gij', 0), 'giji': ('gij', 0), 'gijo': ('gij',
        0), 'giju': ('gij', 0), 'gova': ('g', 0), 'gove': ('g', 0), 'govi':
        ('g', 0), 'ieci': ('i', 1), 'ieći': ('i', 0), 'ijem': ('i', 0),
        'ijes': ('i', 1), 'iješ': ('i', 0), 'ijmo': ('i', 0), 'ijte': ('i',
        0), 'ilom': ('i', 0), 'inom': ('in', 0), 'irah': ('ir', 0), 'iral':
        ('ir', 0), 'iram': ('ir', 0), 'iran': ('ir', 0), 'irao': ('ir', 0),
        'iras': ('ir', 1), 'irat': ('ir', 0), 'iraš': ('ir', 0), 'iruj':
        ('ir', 0), 'isem': ('is', 1), 'ismo': ('i', 0), 'isom': ('is', 0),
        'ista': ('ist', 0), 'iste': ('ist', 0), 'isti': ('ist', 0), 'isto':
        ('ist', 0), 'istu': ('ist', 0), 'ivah': ('iva', 0), 'ivaj': ('iva',
        0), 'ivam': ('iva', 0), 'ivan': ('iva', 0), 'ivao': ('iva', 0),
        'ivas': ('iva', 1), 'ivat': ('iva', 0), 'ivav': ('iva', 0), 'ivaš':
        ('iva', 0), 'iveg': ('iv', 0), 'ivem': ('iv', 0), 'ivih': ('iv', 0),
        'ivim': ('iv', 0), 'ivog': ('iv', 0), 'ivoj': ('iv', 0), 'ivom':
        ('iv', 0), 'ivsi': ('i', 1), 'ivši': ('i', 0), 'išem': ('iš', 0),
        'išom': ('iš', 0), 'išta': ('išt', 0), 'ište': ('išt', 0), 'ištu':
        ('išt', 0), 'jasa': ('jas', 1), 'jase': ('jas', 1), 'jasi': ('jas',
        1), 'jasu': ('jas', 1), 'jaša': ('jaš', 0), 'jaše': ('jaš', 0),
        'jaši': ('jaš', 0), 'jašu': ('jaš', 0), 'kasa': ('kas', 1), 'kase':
        ('kas', 1), 'kasi': ('kas', 1), 'kasu': ('kas', 1), 'kaša': ('kaš',
        0), 'kaše': ('kaš', 0), 'kaši': ('kaš', 0), 'kašu': ('kaš', 0),
        'kega': ('k', 0), 'kemu': ('k', 0), 'kija': ('k', 0), 'kije': ('k',
        0), 'kiji': ('k', 0), 'kiju': ('k', 0), 'kima': ('k', 0), 'koga':
        ('k', 0), 'kome': ('k', 0), 'komu': ('k', 0), 'ksta': ('kst', 0),
        'kste': ('kst', 0), 'ksti': ('kst', 0), 'ksto': ('kst', 0), 'kstu':
        ('kst', 0), 'laja': ('laj', 0), 'laje': ('laj', 0), 'laji': ('laj',
        0), 'laju': ('laj', 0), 'lata': ('lat', 0), 'late': ('lat', 0),
        'lati': ('lat', 0), 'lato': ('lat', 0), 'latu': ('lat', 0), 'lema':
        ('lem', 0), 'leme': ('lem', 0), 'lemi': ('lem', 0), 'lemo': ('lem',
        0), 'lemu': ('lem', 0), 'lija': ('li', 0), 'lije': ('lij', 0),
        'liji': ('lij', 0), 'lijo': ('lij', 0), 'liju': ('li', 0), 'loga':
        ('log', 0), 'loge': ('log', 0), 'logu': ('log', 0), 'lova': ('lov',
        0), 'love': ('lov', 0), 'lovi': ('lov', 0), 'lovu': ('lov', 0),
        'luce': ('luc', 1), 'luci': ('luc', 1), 'luče': ('luč', 0), 'luči':
        ('luč', 0), 'mija': ('mij', 0), 'mije': ('mij', 0), 'miji': ('mij',
        0), 'mijo': ('mij', 0), 'miju': ('mij', 0), 'mova': ('mov', 0),
        'move': ('mov', 0), 'movi': ('mov', 0), 'movu': ('mov', 0), 'nala':
        ('nal', 0), 'nale': ('nal', 0), 'nali': ('nal', 0), 'nalo': ('nal',
        0), 'nalu': ('nal', 0), 'nasa': ('nas', 1), 'nase': ('nas', 1),
        'nasi': ('nas', 1), 'nasu': ('nas', 1), 'naša': ('naš', 0), 'naše':
        ('naš', 0), 'naši': ('naš', 0), 'našu': ('naš', 0), 'nega': ('n',
        0), 'nemo': ('n', 0), 'nemu': ('n', 0), 'nete': ('n', 0), 'nija':
        ('n', 0), 'nije': ('n', 0), 'niji': ('n', 0), 'nijo': ('nij', 0),
        'niju': ('n', 0), 'nila': ('ni', 0), 'nile': ('ni', 0), 'nili':
        ('ni', 0), 'nilo': ('ni', 0), 'nima': ('n', 0), 'nimo': ('n', 0),
        'nite': ('n', 0), 'niti': ('ni', 0), 'noga': ('n', 0), 'nome': ('n',
        0), 'nomu': ('n', 0), 'nuci': ('n', 1), 'nula': ('n', 0), 'nule':
        ('n', 0), 'nuli': ('n', 0), 'nulo': ('n', 0), 'nuta': ('n', 0),
        'nuti': ('n', 0), 'nuto': ('n', 0), 'nući': ('n', 0), 'olom': ('ol',
        0), 'onom': ('on', 0), 'orom': ('or', 0), 'oseg': ('os', 1), 'osem':
        ('os', 1), 'osih': ('os', 1), 'osim': ('os', 1), 'osog': ('os', 1),
        'osoj': ('os', 1), 'osom': ('os', 1), 'osta': ('ost', 0), 'oste':
        ('ost', 0), 'osti': ('ost', 0), 'osto': ('ost', 0), 'ostu': ('ost',
        0), 'otio': ('oti', 0), 'ovah': ('ova', 0), 'ovao': ('ova', 0),
        'ovat': ('ova', 0), 'oveg': ('ov', 0), 'ovih': ('ov', 0), 'ovim':
        ('ov', 0), 'ovog': ('ov', 0), 'ovoj': ('ov', 0), 'ovom': ('ov', 0),
        'ošeg': ('oš', 0), 'ošem': ('oš', 0), 'oših': ('oš', 0), 'ošim':
        ('oš', 0), 'ošog': ('oš', 0), 'ošoj': ('oš', 0), 'ošom': ('oš', 0),
        'pija': ('pij', 0), 'pije': ('pij', 0), 'piji': ('pij', 0), 'pijo':
        ('pij', 0), 'piju': ('pij', 0), 'raja': ('raj', 0), 'raje': ('raj',
        0), 'raji': ('raj', 0), 'raju': ('raj', 0), 'rama': ('ram', 0),
        'rame': ('ram', 0), 'rami': ('ram', 0), 'ramo': ('ram', 0), 'ramu':
        ('ram', 0), 'rija': ('rij', 0), 'rije': ('rij', 0), 'riji': ('rij',
        0), 'rijo': ('rij', 0), 'riju': ('rij', 0), 'sija': ('si', 0),
        'sije': ('sij', 0), 'siji': ('sij', 0), 'sijo': ('sij', 0), 'siju':
        ('si', 0), 'skem': ('sk', 0), 'skih': ('sk', 0), 'skim': ('sk', 0),
        'skog': ('sk', 0), 'skoj': ('sk', 0), 'skom': ('sk', 0), 'sneg':
        ('sn', 1), 'snem': ('sn', 1), 'snja': ('snj', 1), 'snje': ('snj',
        1), 'snji': ('snj', 1), 'snjo': ('snj', 1), 'snju': ('snj', 1),
        'stva': ('stv', 0), 'stvo': ('stv', 0), 'stvu': ('stv', 0), 'taju':
        ('ta', 0), 'tala': ('ta', 0), 'tale': ('ta', 0), 'tali': ('ta', 0),
        'talo': ('ta', 0), 'tamo': ('ta', 0), 'tana': ('ta', 0), 'tane':
        ('ta', 0), 'tani': ('ta', 0), 'tano': ('ta', 0), 'tasa': ('tas', 1),
        'tase': ('tas', 1), 'tasi': ('tas', 1), 'tasu': ('tas', 1), 'tate':
        ('ta', 0), 'tati': ('ta', 0), 'taša': ('taš', 0), 'taše': ('taš',
        0), 'taši': ('taš', 0), 'tašu': ('taš', 0), 'tija': ('tij', 0),
        'tije': ('tij', 0), 'tiji': ('tij', 0), 'tijo': ('tij', 0), 'tiju':
        ('tij', 0), 'uceg': ('uc', 1), 'ucem': ('uc', 1), 'ucih': ('uc', 1),
        'ucim': ('uc', 1), 'ucog': ('uc', 1), 'ucoj': ('uc', 1), 'ucom':
        ('uc', 1), 'ucuh': ('uc', 1), 'ugom': ('ug', 0), 'ujem': ('uj', 0),
        'ujes': ('uj', 1), 'uješ': ('uj', 0), 'ujmo': ('uj', 0), 'urah':
        ('ur', 0), 'uraj': ('ur', 0), 'ural': ('ur', 0), 'uram': ('ur', 0),
        'uran': ('ur', 0), 'urao': ('ur', 0), 'uras': ('ur', 1), 'urat':
        ('ur', 0), 'uraš': ('ur', 0), 'uvah': ('uva', 0), 'uvaj': ('uva',
        0), 'uvam': ('uva', 0), 'uvan': ('uva', 0), 'uvao': ('uva', 0),
        'uvas': ('uva', 1), 'uvat': ('uva', 0), 'uvav': ('uva', 0), 'uvaš':
        ('uva', 0), 'ućeg': ('uć', 0), 'ućem': ('uć', 0), 'ućih': ('uć', 0),
        'ućim': ('uć', 0), 'ućog': ('uć', 0), 'ućoj': ('uć', 0), 'ućom':
        ('uć', 0), 'ućuh': ('uć', 0), 'vasa': ('vas', 1), 'vase': ('vas',
        1), 'vasi': ('vas', 1), 'vasu': ('vas', 1), 'vaša': ('vaš', 0),
        'vaše': ('vaš', 0), 'vaši': ('vaš', 0), 'vašu': ('vaš', 0), 'zija':
        ('zij', 0), 'zije': ('zij', 0), 'ziji': ('zij', 0), 'zijo': ('zij',
        0), 'ziju': ('zij', 0), 'ćaja': ('ćaj', 0), 'ćaje': ('ćaj', 0),
        'ćaji': ('ćaj', 0), 'ćaju': ('ćaj', 0), 'čaja': ('čaj', 0), 'čaje':
        ('čaj', 0), 'čaji': ('čaj', 0), 'čaju': ('čaj', 0), 'čina': ('čin',
        0), 'čine': ('čin', 0), 'čini': ('čin', 0), 'čino': ('čin', 0),
        'činu': ('čin', 0), 'đaja': ('đaj', 0), 'đaje': ('đaj', 0), 'đaji':
        ('đaj', 0), 'đaju': ('đaj', 0), 'škem': ('šk', 0), 'ških': ('šk',
        0), 'škim': ('šk', 0), 'škog': ('šk', 0), 'škoj': ('šk', 0), 'škom':
        ('šk', 0), 'šneg': ('šn', 0), 'šnem': ('šn', 0), 'šnja': ('šnj', 0),
        'šnje': ('šnj', 0), 'šnji': ('šnj', 0), 'šnjo': ('šnj', 0), 'šnju':
        ('šnj', 0), 'štva': ('štv', 0), 'štvo': ('štv', 0), 'štvu': ('štv',
        0), 'žija': ('žij', 0), 'žije': ('žij', 0), 'žiji': ('žij', 0),
        'žijo': ('žij', 0), 'žiju': ('žij', 0)},
    3: {'aca': ('ac', 1), 'ace': ('ac', 1), 'aci': ('ac', 1), 'ahu': ('a',
        0), 'aja': ('aj', 0), 'aje': ('a', 0), 'aji': ('aj', 0), 'aju':
        ('a', 0), 'ala': ('a', 0), 'ale': ('a', 0), 'ali': ('a', 0), 'alo':
        ('a', 0), 'alu': ('a', 0), 'amo': ('a', 0), 'ana': ('an', 0), 'ane':
        ('an', 0), 'ani': ('an', 0), 'ano': ('a', 0), 'anu': ('an', 0),
        'ara': ('ar', 0), 'are': ('ar', 0), 'ari': ('ar', 0), 'aru': ('ar',
        0), 'ase': ('a', 1), 'ata': ('at', 0), 'ate': ('a', 0), 'ati': ('a',
        0), 'ato': ('at', 0), 'atu': ('at', 0), 'ava': ('av', 0), 'ave':
        ('av', 0), 'avi': ('av', 0), 'avo': ('av', 0), 'avu': ('av', 0),
        'aća': ('ać', 0), 'aće': ('ać', 0), 'ače': ('ač', 0), 'ači': ('ač',
        0), 'aše': ('a', 0), 'dra': ('dr', 0), 'dre': ('dr', 0), 'dri':
        ('dr', 0), 'dru': ('dr', 0), 'eca': ('ec', 1), 'ece': ('ec', 1),
        'ela': ('el', 0), 'ele': ('el', 0), 'eli': ('el', 0), 'elo': ('el',
        0), 'elu': ('el', 0), 'emo': ('e', 0), 'era': ('er', 0), 'ere':
        ('er', 0), 'eri': ('er', 0), 'eru': ('er', 0), 'esa': ('es', 0),
        'ese': ('es', 0), 'esi': ('es', 1), 'esu': ('es', 0), 'eta': ('et',
        0), 'ete': ('et', 0), 'eti': ('et', 0), 'eto': ('et', 0), 'etu':
        ('et', 0), 'eva': ('ev', 0), 'eve': ('ev', 0), 'evi': ('ev', 0),
        'evo': ('ev', 0), 'evu': ('ev', 0), 'eća': ('eć', 0), 'eće': ('eć',
        0), 'eša': ('eš', 0), 'eše': ('eš', 0), 'eši': ('eš', 0), 'ešu':
        ('eš', 0), 'gom': ('g', 0), 'ije': ('i', 0), 'iju': ('i', 0), 'ila':
        ('i', 0), 'ile': ('i', 0), 'ili': ('i', 0), 'ilo': ('i', 0), 'ilu':
        ('i', 0), 'imo': ('i', 0), 'ina': ('in', 0), 'ine': ('in', 0),
        'ini': ('in', 0), 'ino': ('in', 0), 'inu': ('in', 0), 'isa': ('is',
        0), 'ise': ('is', 0), 'isi': ('is', 1), 'isu': ('is', 0), 'ite':
        ('i', 0), 'iti': ('i', 0), 'iva': ('iv', 0), 'ive': ('iv', 0),
        'ivi': ('iv', 0), 'ivo': ('iv', 0), 'ivu': ('iv', 0), 'iša': ('iš',
        0), 'iše': ('iš', 0), 'iši': ('iš', 0), 'išu': ('iš', 0), 'keg':
        ('k', 0), 'kem': ('k', 0), 'kih': ('k', 0), 'kim': ('k', 0), 'kog':
        ('k', 0), 'koj': ('k', 0), 'kom': ('k', 0), 'kov': ('k', 0), 'lio':
        ('li', 0), 'neg': ('n', 0), 'nem': ('n', 0), 'nes': ('n', 1), 'neš':
        ('n', 0), 'nih': ('n', 0), 'nim': ('n', 0), 'nio': ('ni', 0), 'nis':
        ('ni', 1), 'niš': ('ni', 0), 'nog': ('n', 0), 'noj': ('n', 0),
        'nom': ('n', 0), 'nuo': ('n', 0), 'nut': ('n', 0), 'ola': ('ol', 0),
        'ole': ('ol', 0), 'oli': ('ol', 0), 'olu': ('ol', 0), 'ona': ('on',
        0), 'one': ('on', 0), 'oni': ('on', 0), 'onu': ('on', 0), 'ora':
        ('or', 0), 'ore': ('or', 0), 'ori': ('or', 0), 'oru': ('or', 0),
        'osa': ('os', 1), 'ose': ('os', 1), 'osi': ('os', 1), 'osu': ('os',
        1), 'ova': ('ov', 0), 'ove': ('ov', 0), 'ovi': ('ov', 0), 'ovo':
        ('ov', 0), 'ovu': ('ov', 0), 'oša': ('oš', 0), 'oše': ('oš', 0),
        'oši': ('oš', 0), 'ošu': ('oš', 0), 'sio': ('si', 0), 'ska': ('sk',
        0), 'ske': ('sk', 0), 'ski': ('sk', 0), 'sko': ('sk', 0), 'sku':
        ('sk', 0), 'tah': ('ta', 0), 'taj': ('ta', 0), 'tam': ('ta', 0),
        'tan': ('ta', 0), 'tao': ('ta', 0), 'tas': ('ta', 1), 'tat': ('ta',
        0), 'taš': ('ta', 0), 'uca': ('uc', 1), 'uce': ('uc', 1), 'uga':
        ('ug', 0), 'uge': ('ug', 0), 'ugi': ('ug', 0), 'ugo': ('ug', 0),
        'ugu': ('ug', 0), 'uje': ('uj', 0), 'uju': ('uj', 0), 'uća': ('uć',
        0), 'uće': ('uć', 0), 'ška': ('šk', 0), 'ške': ('šk', 0), 'ški':
        ('šk', 0), 'ško': ('šk', 0), 'šku': ('šk', 0)},
    2: {'ah': ('a', 0), 'aj': ('a', 0), 'al': ('a', 0), 'am': ('a', 0),
        'an': ('a', 0), 'ao': ('a', 0), 'as': ('a', 1), 'at': ('a', 0),
        'aš': ('a', 0), 'el': ('e', 0), 'em': ('e', 0), 'es': ('e', 1),
        'eš': ('e', 0), 'ga': ('g', 0), 'ge': ('g', 0), 'gi': ('g', 0),
        'go': ('g', 0), 'gu': ('g', 0), 'ih': ('i', 0), 'ij': ('i', 0),
        'il': ('i', 0), 'im': ('i', 0), 'io': ('i', 0), 'is': ('i', 1),
        'it': ('i', 0), 'iš': ('i', 0), 'ka': ('k', 0), 'ke': ('k', 0),
        'ki': ('k', 0), 'ko': ('k', 0), 'ku': ('k', 0), 'na': ('n', 0),
        'ne': ('n', 0), 'ni': ('n', 0), 'no': ('n', 0), 'nu': ('n', 0)},
}

_SR_STEP3 = ('anog', 'enog', 'anih', 'enih', 'anoj', 'enoj', 'anim', 'enim', 'enom', 'oga', 'ama', 'ima', 'ena', 'ani', 'eni', 'ano', 'eno', 'ost', 'enu', 'og', 'om', 'a', 'e', 'i', 'o', 'u',)
_SR_STEP3_MAX = max(len(s) for s in _SR_STEP3)


def _sr_prelude(w: str) -> str:
    w = w.translate(_SR_CYR_TRANS)
    prev = None
    while prev != w:
        prev = w
        w = _SR_IJE.sub("e", w)
    prev = None
    while prev != w:
        prev = w
        w = _SR_JE.sub("e", w)
    return w.replace("dj", "\u0111")


def _sr_regions(w: str) -> int:
    n = len(w)
    p1 = n
    i = 0
    while i < n and w[i] not in _SR_VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
        if p1 < 2:
            # word-initial vowel: R1 starts after the next consonant instead
            j = p1
            while j < n and w[j] in _SR_VOWELS:
                j += 1
            p1 = n if j >= n else j + 1
    # vocalic r: an early 'r' nucleus pulls R1 forward
    r = w.find("r")
    if r >= 0:
        rc = r + 1
        if rc < 2:
            j = rc
            while j < n and w[j] == "r":
                j += 1
            rc = None if j >= n else j + 1
        if rc is not None and p1 - rc > 1:
            p1 = rc
    return p1


def _sr_longest(w: str, buckets: dict):
    for L, d in buckets.items():
        if L > len(w):
            continue
        hit = d.get(w[-L:])
        if hit is not None:
            return len(w) - L, hit
    return None, None


def serbian_stem(word: str) -> str:
    """Snowball Serbian (SnowballFilter(in, "Serbian"))."""
    w = _sr_prelude(word)
    p1 = _sr_regions(w)
    nd = not (_SR_DIACRITICS & set(w))

    start, hit = _sr_longest(w, _SR_STEP1)
    if hit is not None and (nd or not hit[1]):
        w = w[:start] + hit[0]

    start, hit = _sr_longest(w, _SR_STEP2)
    if hit is not None and start >= p1 and (nd or not hit[1]):
        w = w[:start] + hit[0]
    else:
        for L in range(min(_SR_STEP3_MAX, len(w)), 0, -1):
            if w[-L:] in _SR_STEP3:
                if len(w) - L >= p1:
                    w = w[:-L]
                break
    return w


def serbian_analyzer():
    """SerbianAnalyzer.java chain stages that apply here: Snowball stem
    then SerbianNormalizationFilter (sr/SerbianAnalyzer.java:111-112)."""
    from .analysis import Analyzer
    from .filters import serbian_normalize

    return Analyzer(post_filters=(serbian_stem, serbian_normalize))
