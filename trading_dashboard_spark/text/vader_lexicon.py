"""Vendored sentiment lexicon + rule constants, VADER format.

The reference scores news with NLTK VADER's compound score
(dags/tasks/fetch_transform_news.py:171-175): a ~7.5k-entry valence
lexicon on a [-4, 4] scale plus rule-based modifiers (negation, degree
boosters, punctuation emphasis), normalized to [-1, 1] by
``s / sqrt(s*s + 15)`` (Hutto & Gilbert, ICWSM 2014; MIT-licensed).

This container cannot install nltk/vaderSentiment, so the engine vendors
a curated ~330-entry subset with valences on the same [-4, 4] scale,
weighted toward the financial/news vocabulary the reference scores. The
``LEXICON_DATA`` format is exactly ``vader_lexicon.txt``'s first two
columns (token<TAB>valence), so dropping in the full MIT-licensed file
upgrades coverage with no code change. The rule constants below are the
published VADER values.
"""

from __future__ import annotations

#: token<TAB>mean-valence, the first two columns of vader_lexicon.txt.
LEXICON_DATA = """\
abandon\t-1.9
abuse\t-3.2
accident\t-2.1
accomplish\t1.8
achieve\t1.8
adore\t2.9
advantage\t1.7
afraid\t-2.2
aggressive\t-0.6
agree\t1.5
alarm\t-1.4
amazing\t2.8
ambitious\t1.5
angry\t-2.3
annoy\t-1.9
anxious\t-1.9
appeal\t1.3
approval\t1.8
argue\t-1.4
arrest\t-1.4
attack\t-2.1
attract\t1.7
avoid\t-1.2
award\t2.5
awesome\t3.1
awful\t-2.9
bad\t-2.5
bankrupt\t-2.6
bankruptcy\t-2.6
bargain\t1.5
barrier\t-1.1
beat\t1.1
beautiful\t2.9
benefit\t2.0
best\t3.2
betray\t-3.0
blame\t-2.2
block\t-1.3
bold\t1.3
bonus\t2.4
boom\t1.4
boost\t1.7
bother\t-1.3
brave\t2.3
breach\t-1.9
bright\t1.9
brilliant\t2.8
broke\t-1.8
burden\t-1.5
calm\t1.3
cancel\t-1.3
capable\t1.6
careless\t-1.5
casualty\t-2.4
caution\t-0.8
celebrate\t2.7
champion\t2.4
chaos\t-2.6
cheat\t-2.4
cheer\t2.3
clash\t-1.7
clean\t1.7
clever\t2.0
collapse\t-2.2
comfort\t1.9
commend\t2.0
complain\t-1.6
concern\t-1.1
confident\t2.2
conflict\t-1.8
confuse\t-1.2
congratulate\t2.5
convict\t-2.2
cool\t1.3
corrupt\t-3.0
crash\t-1.6
create\t1.4
credit\t1.4
crime\t-2.5
crisis\t-3.1
critical\t-1.4
cruel\t-2.8
damage\t-2.2
danger\t-2.4
dead\t-3.3
deadlock\t-1.4
debt\t-1.6
deceive\t-2.4
decline\t-1.4
default\t-1.4
defeat\t-1.8
defect\t-1.8
deficit\t-1.6
delay\t-1.2
delight\t2.9
deny\t-1.4
depress\t-2.2
despair\t-2.9
destroy\t-2.6
devastate\t-3.1
die\t-2.9
difficult\t-1.5
disappoint\t-2.2
disaster\t-3.1
dishonest\t-2.4
dismal\t-2.1
dispute\t-1.6
disrupt\t-1.5
distress\t-2.4
doom\t-2.7
doubt\t-1.4
down\t-1.1
downgrade\t-1.6
drop\t-1.1
dull\t-1.6
dump\t-1.4
eager\t1.7
earn\t1.7
ease\t1.3
easy\t1.9
efficient\t1.9
embarrass\t-1.9
emergency\t-2.2
empower\t1.9
encourage\t2.1
endorse\t1.6
enjoy\t2.4
enrich\t1.9
enthusiastic\t2.4
error\t-1.6
evade\t-1.4
evil\t-3.3
exceed\t1.6
excellent\t2.7
excite\t2.4
expand\t1.2
expensive\t-1.0
fail\t-2.3
failure\t-2.5
fair\t1.6
fake\t-1.9
fall\t-1.3
false\t-1.6
fame\t1.8
fantastic\t2.6
fast\t0.9
fault\t-1.8
favor\t1.7
fear\t-2.2
fine\t0.8
fire\t-1.4
flaw\t-1.8
flourish\t2.2
fond\t1.9
forbid\t-1.5
forfeit\t-1.5
forgive\t1.6
fortune\t2.2
foul\t-2.1
fraud\t-2.8
free\t2.3
fresh\t1.3
friendly\t2.2
frighten\t-2.2
frustrate\t-2.1
fun\t2.3
gain\t1.6
generous\t2.3
gentle\t1.9
genius\t2.6
glad\t2.0
gloom\t-2.1
glory\t2.3
good\t1.9
grand\t2.2
grateful\t2.4
great\t3.1
greed\t-2.4
grief\t-2.5
grow\t1.4
growth\t1.6
guilt\t-2.3
halt\t-1.0
happy\t2.7
harm\t-2.4
harsh\t-1.9
hate\t-2.7
hazard\t-2.0
heal\t1.8
healthy\t2.1
help\t1.7
hero\t2.6
hinder\t-1.5
honest\t2.3
honor\t2.4
hope\t1.9
hopeless\t-2.6
hostile\t-2.3
hurt\t-2.2
ideal\t2.2
ignore\t-1.4
ill\t-1.9
illegal\t-2.6
improve\t1.9
incompetent\t-2.2
inferior\t-1.8
injure\t-2.0
innovative\t1.9
insolvent\t-2.1
inspire\t2.3
insult\t-2.2
intelligent\t2.3
interest\t1.4
invalid\t-1.4
jail\t-2.3
jeopardy\t-2.2
joy\t2.9
justice\t2.2
keen\t1.5
kill\t-3.4
kind\t2.4
lack\t-1.3
lag\t-1.0
lawsuit\t-1.4
lazy\t-1.7
leak\t-1.2
liable\t-1.2
lie\t-2.4
limit\t-0.8
lose\t-2.0
loss\t-1.3
lost\t-1.4
loyal\t2.1
lucky\t2.4
mad\t-2.2
magnificent\t2.9
manipulate\t-1.7
mature\t1.4
mediocre\t-1.1
mess\t-1.6
miracle\t2.8
miserable\t-2.7
miss\t-1.0
mistake\t-1.8
mock\t-1.8
motivate\t1.9
neat\t1.7
negative\t-1.6
neglect\t-1.9
nervous\t-1.7
nice\t1.8
noble\t2.1
obstacle\t-1.4
offend\t-2.0
opportunity\t1.8
optimism\t2.2
outage\t-1.5
outstanding\t2.7
overcome\t1.6
panic\t-2.5
peace\t2.5
penalty\t-1.7
perfect\t2.7
peril\t-2.2
pessimism\t-2.0
plunge\t-1.5
poor\t-2.1
popular\t2.1
positive\t2.1
poverty\t-2.3
praise\t2.4
precious\t2.2
pressure\t-1.2
prestige\t1.9
pretty\t2.0
problem\t-1.7
profit\t1.9
progress\t1.8
promise\t1.5
promote\t1.7
prosper\t2.4
protect\t1.4
proud\t2.2
prudent\t1.5
punish\t-2.1
quality\t1.5
quit\t-1.2
rally\t1.3
rebound\t1.3
recession\t-2.2
reckless\t-1.9
recover\t1.4
refuse\t-1.4
regret\t-2.0
reject\t-1.8
relief\t1.9
reliable\t2.0
rescue\t1.9
resign\t-1.2
resolve\t1.4
restore\t1.5
restrict\t-1.2
reward\t2.2
rich\t2.1
rise\t1.0
risk\t-1.1
robust\t1.6
ruin\t-2.6
safe\t1.9
satisfy\t1.9
save\t2.2
scandal\t-2.3
scare\t-2.2
secure\t1.7
setback\t-1.7
severe\t-1.9
shame\t-2.1
shine\t1.8
shock\t-1.8
shortage\t-1.6
shrink\t-1.0
sick\t-2.3
slow\t-1.0
slump\t-1.6
smart\t2.0
smooth\t1.4
solid\t1.3
solve\t1.5
sorrow\t-2.5
sorry\t-1.1
spam\t-1.6
stable\t1.3
stagnant\t-1.3
steal\t-2.4
stimulate\t1.4
strength\t1.9
stress\t-1.9
strike\t-1.2
strong\t2.3
struggle\t-1.9
stupid\t-2.4
succeed\t2.2
success\t2.7
suffer\t-2.4
super\t2.9
superior\t2.1
support\t1.7
surge\t1.4
surpass\t1.6
sweet\t2.0
talent\t2.0
terrible\t-2.1
terrific\t2.7
terror\t-3.1
thank\t1.9
threat\t-2.4
thrive\t2.3
tough\t-1.0
toxic\t-2.4
tragedy\t-3.0
triumph\t2.7
trouble\t-2.0
trust\t2.1
turmoil\t-2.1
ugly\t-2.3
unable\t-1.4
uncertain\t-1.2
unemployment\t-2.0
unfair\t-2.2
unhappy\t-2.2
unstable\t-1.6
up\t0.8
upgrade\t1.8
uplift\t2.1
upset\t-1.9
urgent\t-1.1
useful\t1.8
useless\t-1.9
value\t1.4
vibrant\t1.9
victory\t2.6
violate\t-2.2
violent\t-2.9
vital\t1.2
volatile\t-1.3
vulnerable\t-1.5
war\t-2.9
warn\t-1.4
waste\t-1.8
weak\t-1.9
wealth\t2.2
welcome\t1.9
win\t2.8
winner\t2.7
wise\t2.1
wonderful\t2.9
worry\t-1.9
worse\t-2.1
worst\t-3.1
worth\t1.4
wreck\t-2.1
wrong\t-2.1
zeal\t1.7
"""

#: token -> valence on [-4, 4].
LEXICON: dict[str, float] = {
    tok: float(val)
    for tok, val in (line.split("\t") for line in LEXICON_DATA.splitlines() if line)
}

#: Negation cues — flip a valenced token within 3 preceding positions by
#: N_SCALAR (VADER's NEGATE list, apostrophes preserved by tokenization).
NEGATORS = frozenset({
    "not", "no", "never", "neither", "nor", "cannot", "without", "nothing",
    "nobody", "none", "nope", "nah", "rarely", "seldom", "hardly", "scarcely",
    "can't", "cant", "don't", "dont", "won't", "wont", "isn't", "isnt",
    "wasn't", "wasnt", "aren't", "arent", "doesn't", "doesnt", "didn't",
    "didnt", "couldn't", "couldnt", "shouldn't", "shouldnt", "wouldn't",
    "wouldnt", "hasn't", "hasnt", "haven't", "havent", "ain't", "aint",
})

#: Degree modifiers (VADER's BOOSTER_DICT shape): intensifiers add B_INCR
#: to a following valenced token's magnitude, dampeners subtract it.
INTENSIFIERS = frozenset({
    "very", "extremely", "absolutely", "completely", "considerably",
    "decidedly", "deeply", "enormously", "entirely", "especially",
    "exceptionally", "extraordinarily", "greatly", "highly", "hugely",
    "incredibly", "intensely", "more", "most", "particularly", "purely",
    "quite", "really", "remarkably", "so", "substantially", "thoroughly",
    "totally", "tremendously", "unusually", "utterly",
})
DAMPENERS = frozenset({
    "almost", "barely", "kinda", "less", "little", "marginally",
    "occasionally", "partly", "slightly", "somewhat",
})

# Published VADER rule constants (Hutto & Gilbert 2014).
B_INCR = 0.293      # degree-modifier increment
C_INCR = 0.733      # ALL-CAPS emphasis increment (mixed-case docs only)
N_SCALAR = -0.74    # negation flip scalar
EP_AMPLIFY = 0.292  # per-'!' emphasis, capped at 4
EP_CAP = 4
#: '?' emphasis: 2-3 question marks add QM_AMPLIFY each, more saturate
#: at QM_MAX (one or zero adds nothing)
QM_AMPLIFY = 0.18
QM_MAX = 0.96
#: "but"-clause reweighting: sentiments before the first 'but' are
#: discounted, after it amplified (contrastive conjunction shifts focus)
BUT_BEFORE = 0.5
BUT_AFTER = 1.5
#: distance decay for degree modifiers at positions -2 / -3
DECAY_2 = 0.95
DECAY_3 = 0.9
