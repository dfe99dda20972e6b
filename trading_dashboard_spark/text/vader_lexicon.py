"""Vendored sentiment lexicon + rule constants, VADER format.

The reference scores news with NLTK VADER's compound score
(dags/tasks/fetch_transform_news.py:171-175): a ~7.5k-entry valence
lexicon on a [-4, 4] scale plus rule-based modifiers (negation, degree
boosters, punctuation emphasis), normalized to [-1, 1] by
``s / sqrt(s*s + 15)`` (Hutto & Gilbert, ICWSM 2014; MIT-licensed).

This container cannot install nltk/vaderSentiment or reach the network,
so the engine vendors a curated ~4,100-entry set with valences on the
same [-4, 4] scale — the base financial/news vocabulary plus two
inflected-form/general-sentiment expansion tiers — NOT a verbatim copy of
the published 7.5k file (typing 7,500 empirical decimals from memory
would fabricate data). The ``LEXICON_DATA`` format is exactly
``vader_lexicon.txt``'s first two columns (token<TAB>valence), and
:func:`_load_dropin` picks up a real local copy of the published file
(``$VADER_LEXICON_PATH`` / vaderSentiment / nltk_data) at import time in
preference to the builtin set, so full-lexicon parity is automatic
wherever the file exists. The rule constants below are the published
VADER values.
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
badass\t1.4
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
breaks\t-1.2
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
collapse\t-1.1
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
entertaining\t1.9
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
false\t-1.6
fame\t1.8
fantastic\t2.6
fast\t0.9
fault\t-1.7
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
like\t1.5
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
smart\t1.7
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

#: Expansion tier: inflected forms of the base stems (headline English is
#: mostly inflected — "profits fell", "shares surged") plus a broader
#: general-sentiment vocabulary. Same curated-estimate status and format
#: as LEXICON_DATA (see module docstring); inflections carry their stem's
#: valence with small morphological adjustments, matching the published
#: lexicon's own convention (e.g. 'abandoned' ~= 'abandon').
LEXICON_DATA_EXTENSION = """\
abandoned\t-2.0
abandons\t-1.9
abducted\t-2.3
abhor\t-2.6
abilities\t1.0
ability\t1.3
aboard\t0.4
absolve\t1.4
abused\t-3.1
abuses\t-3.0
abusive\t-3.2
accept\t1.1
acceptable\t1.3
accepted\t1.1
accidental\t-1.2
accidents\t-2.1
accomplished\t1.9
accomplishment\t1.9
accusation\t-1.7
accuse\t-1.8
accused\t-1.6
aches\t-1.6
achievable\t1.3
achieved\t1.8
achievement\t2.0
acquit\t1.0
admirable\t2.2
admire\t2.2
admired\t2.2
adopt\t0.7
adorable\t2.4
adored\t2.8
advanced\t1.4
advances\t1.3
adventure\t1.6
adversary\t-1.2
adverse\t-1.5
adversity\t-1.6
advice\t0.9
advise\t0.8
affection\t2.4
affectionate\t2.3
afflicted\t-1.9
affordable\t1.5
aggravate\t-2.0
aggression\t-2.1
agonize\t-2.4
agony\t-2.7
agreeable\t1.7
agreed\t1.2
agreement\t1.4
agrees\t1.2
alarmed\t-1.4
alarming\t-1.8
alert\t-0.4
alive\t1.6
alone\t-1.0
amaze\t2.5
amazed\t2.4
amazes\t2.4
ambition\t1.3
amuse\t1.7
amused\t1.8
amusing\t1.9
anger\t-2.7
angers\t-2.3
anguish\t-2.9
animosity\t-2.2
annoyance\t-1.8
annoyed\t-1.8
annoying\t-2.0
anticipation\t0.6
anxiety\t-1.9
apathy\t-1.2
apocalypse\t-3.4
apologize\t0.4
apology\t0.2
appalled\t-2.3
appalling\t-2.7
appease\t0.8
applaud\t2.0
applause\t2.0
appreciate\t1.9
appreciated\t2.0
appreciation\t2.1
apprehensive\t-1.2
approve\t1.8
approved\t1.9
approves\t1.8
assault\t-2.6
assure\t1.2
assured\t1.4
astonished\t1.5
astounding\t2.3
atrocious\t-3.0
atrocity\t-3.1
attacked\t-2.1
attacks\t-2.0
attractive\t1.9
authority\t0.3
avert\t-0.4
awarded\t2.4
awards\t2.4
backing\t1.0
bailout\t-1.1
balanced\t1.1
ban\t-1.8
banned\t-1.9
bans\t-1.7
battle\t-1.6
battles\t-1.4
bearish\t-1.7
beaten\t-1.6
beloved\t2.9
benefits\t1.9
benign\t1.0
bereave\t-2.2
betrayal\t-2.8
betrayed\t-2.9
better\t1.9
bias\t-0.9
biased\t-1.1
bitter\t-1.8
blackmail\t-2.6
blamed\t-2.1
bleak\t-1.9
bless\t1.8
blessed\t2.9
blessing\t2.6
blind\t-1.7
bliss\t2.7
blocked\t-1.4
blocks\t-1.2
blunder\t-1.7
bonuses\t2.2
boosted\t1.7
boosts\t1.6
bore\t-1.1
bored\t-1.3
boring\t-1.3
bottleneck\t-1.2
bounce\t0.8
boycott\t-1.5
brutal\t-3.0
bubble\t-0.8
bullish\t1.7
bully\t-2.6
bullying\t-2.8
burdened\t-1.6
burn\t-1.5
burned\t-1.6
bust\t-1.8
calamity\t-2.6
calmed\t1.2
calming\t1.5
cancellation\t-1.4
cancelled\t-1.3
cancer\t-3.4
capability\t1.0
captivate\t1.9
care\t2.2
cared\t2.0
careful\t1.3
carefree\t1.8
cares\t1.9
caring\t2.2
catastrophe\t-3.4
catastrophic\t-3.5
celebrated\t2.7
celebration\t2.7
certain\t1.1
certainty\t1.2
challenge\t-0.4
challenging\t-0.5
chance\t0.8
charity\t1.8
charm\t1.9
charming\t2.2
cheated\t-2.4
cheerful\t2.5
cheers\t2.2
cherish\t2.3
chic\t1.3
clarity\t1.4
classy\t1.8
clouded\t-1.0
clueless\t-1.7
collapsed\t-1.1
collapses\t-1.1
collide\t-1.4
collusion\t-2.0
comfortable\t1.7
comforting\t1.8
commended\t1.9
commitment\t1.4
compassion\t2.2
compassionate\t2.3
competent\t1.5
competitive\t0.7
complained\t-1.6
complaint\t-1.7
complaints\t-1.7
compliment\t1.9
concede\t-0.6
concerned\t-1.1
concerns\t-1.2
condemn\t-2.2
condemned\t-2.3
confidence\t1.9
confusion\t-1.4
congestion\t-1.1
conquer\t1.4
conspiracy\t-2.1
constrain\t-1.1
constraint\t-1.1
contaminate\t-2.1
contempt\t-2.2
contract\t0.2
contradiction\t-1.1
controversy\t-1.5
convicted\t-2.2
corruption\t-2.9
costly\t-1.4
courage\t2.2
courageous\t2.3
courteous\t1.8
coward\t-2.0
cozy\t1.9
crashed\t-2.3
crashes\t-2.1
creative\t1.9
credible\t1.5
cried\t-1.9
criminal\t-2.5
cripple\t-2.4
crippled\t-2.3
critic\t-1.1
criticism\t-1.6
criticize\t-1.7
criticized\t-1.7
crush\t-1.5
crushed\t-1.7
cry\t-1.9
cut\t-0.9
cuts\t-1.0
cutting\t-0.9
cynical\t-1.6
damaged\t-2.0
damages\t-1.9
damaging\t-2.1
dampen\t-1.0
dangerous\t-2.3
daring\t1.3
dark\t-1.4
deadly\t-2.9
deal\t0.6
dear\t1.7
death\t-2.9
debacle\t-2.4
decay\t-1.6
deceived\t-2.2
deception\t-2.3
dedicated\t1.8
defeated\t-2.0
defend\t0.6
defensive\t-0.7
deficient\t-1.5
defraud\t-2.5
degrade\t-1.9
dejected\t-2.0
delayed\t-1.3
delays\t-1.3
delicious\t2.3
delighted\t2.5
delightful\t2.7
demand\t0.2
demise\t-2.1
demolish\t-1.9
denial\t-1.4
denied\t-1.6
denies\t-1.4
depressed\t-2.3
depression\t-2.6
deprived\t-1.9
derail\t-1.6
desirable\t1.5
desire\t1.2
desperate\t-2.0
despise\t-2.6
destroyed\t-2.6
destruction\t-2.6
destructive\t-2.6
deteriorate\t-2.0
determined\t1.4
devastated\t-3.0
devastating\t-3.1
devoted\t2.0
dignity\t1.8
dilemma\t-1.2
diligent\t1.6
dire\t-2.1
dirty\t-1.8
disadvantage\t-1.6
disagree\t-1.4
disappointed\t-2.1
disappointing\t-2.2
disappointment\t-2.2
disapprove\t-1.9
discomfort\t-1.6
discount\t0.8
discourage\t-1.8
discriminate\t-2.2
disgrace\t-2.4
disgust\t-2.6
disgusting\t-2.8
dishonor\t-2.4
dislike\t-1.7
dismiss\t-1.2
dismissed\t-1.3
disorder\t-1.7
disparity\t-1.3
displeased\t-1.9
disqualify\t-1.7
disregard\t-1.5
distort\t-1.5
distraction\t-1.1
distrust\t-2.1
disturbing\t-2.3
divided\t-1.0
divorce\t-1.9
dominate\t0.4
donate\t1.8
donation\t1.9
doomed\t-2.7
doubtful\t-1.4
doubts\t-1.5
downfall\t-2.1
downturn\t-1.9
drag\t-1.1
dread\t-2.2
dreadful\t-2.7
dream\t1.4
drought\t-1.9
drown\t-2.4
dying\t-2.9
dynamic\t1.2
earnest\t1.4
earnings\t1.0
ecstatic\t3.1
effective\t1.6
elated\t2.7
elegant\t2.1
embarrassed\t-1.9
embarrassing\t-2.0
embrace\t1.5
eminent\t1.5
empathy\t1.8
empty\t-1.2
enchanted\t2.1
endanger\t-2.2
endorsed\t1.6
endure\t-0.3
enemies\t-2.2
enemy\t-2.4
energetic\t1.8
energized\t1.8
engaging\t1.5
enhance\t1.5
enhanced\t1.5
enjoyed\t2.0
enjoying\t2.1
enjoys\t2.0
enlighten\t1.9
enrage\t-2.6
enthusiasm\t2.0
envious\t-1.4
envy\t-1.5
erode\t-1.5
erosion\t-1.4
errors\t-1.6
escalate\t-1.3
escape\t-0.4
essential\t1.2
esteem\t1.8
euphoria\t2.9
evacuate\t-1.8
exaggerate\t-1.1
excel\t2.0
excellence\t2.6
exceptional\t2.4
excited\t2.2
excitement\t2.2
exciting\t2.4
excuse\t-0.4
exhausted\t-1.9
exonerate\t1.2
expansion\t1.2
expel\t-1.9
exploit\t-1.7
exploitation\t-2.1
explosion\t-2.0
expose\t-0.9
extort\t-2.5
extraordinary\t2.3
fabulous\t2.6
failing\t-2.2
fails\t-2.0
fairness\t1.9
faith\t1.9
faithful\t2.1
famine\t-2.6
famous\t1.7
fascinating\t2.2
fatal\t-2.8
fatigue\t-1.5
favorable\t1.8
favorite\t2.0
fearful\t-2.1
fears\t-1.9
feeble\t-1.5
fell\t-1.0
fever\t-1.5
fiasco\t-2.2
fight\t-1.6
fighting\t-1.7
fined\t-1.6
fines\t-1.5
fired\t-2.0
flagship\t1.0
flawed\t-1.9
flawless\t2.5
flee\t-1.7
flood\t-1.8
flourishing\t2.1
foolish\t-1.8
forced\t-1.2
forecast\t0.2
forgave\t1.4
forgiven\t1.6
fortunate\t2.1
forward\t0.6
fragile\t-1.3
fraudulent\t-2.7
freedom\t2.3
friendship\t2.2
frustrated\t-2.1
frustrating\t-2.1
frustration\t-2.1
fulfill\t1.6
fulfilled\t1.8
fumble\t-1.3
funny\t1.9
furious\t-2.7
futile\t-1.7
gained\t1.6
gains\t1.5
generosity\t2.3
gifted\t2.0
glamorous\t1.9
gloomy\t-1.9
glorious\t2.6
goodness\t2.4
goodwill\t2.1
grace\t1.9
graceful\t2.0
gracious\t2.2
grant\t1.2
granted\t1.0
gratitude\t2.3
grave\t-1.9
greedy\t-2.2
grew\t1.0
grim\t-2.0
gross\t-1.9
growing\t1.2
grows\t1.1
guarantee\t1.3
guilty\t-2.3
hacked\t-2.1
hamper\t-1.3
handicap\t-1.4
happiness\t2.8
happily\t2.5
hardship\t-1.9
harmed\t-2.1
harmful\t-2.3
harmony\t2.0
hated\t-2.8
hatred\t-3.2
haunt\t-1.9
havoc\t-2.4
hazardous\t-2.2
healed\t1.8
healing\t1.9
heartbreaking\t-2.7
heartfelt\t2.1
heaven\t2.7
hell\t-2.6
helped\t1.7
helpful\t1.8
helpless\t-2.0
helps\t1.6
hesitant\t-1.0
highlight\t1.2
hilarious\t2.3
hollow\t-1.1
homeless\t-2.2
honored\t2.2
hopeful\t1.9
hopes\t1.6
horrendous\t-2.9
horrible\t-2.5
horrific\t-3.0
horror\t-2.8
hostility\t-2.3
humane\t1.9
humiliate\t-2.5
humiliation\t-2.6
humble\t1.1
humor\t1.4
hunger\t-1.9
hurting\t-2.1
hurts\t-1.9
hype\t-0.3
hysteria\t-2.0
ignorance\t-1.7
ignorant\t-1.9
ignored\t-1.5
illness\t-2.2
imbalance\t-1.1
immoral\t-2.3
impair\t-1.6
impatient\t-1.2
impeccable\t2.3
impede\t-1.3
imperfect\t-1.2
importance\t1.2
important\t1.2
impossible\t-1.6
impress\t1.9
impressed\t2.1
impressive\t2.2
imprison\t-2.1
improved\t1.8
improvement\t1.8
improves\t1.7
improving\t1.7
inability\t-1.4
inadequate\t-1.7
incapable\t-1.6
incentive\t1.2
incident\t-1.1
increase\t0.8
increased\t0.7
indict\t-1.9
indicted\t-2.0
inefficient\t-1.5
inept\t-1.8
inequality\t-1.6
infect\t-1.9
inflation\t-1.2
influential\t1.4
injured\t-2.0
injuries\t-2.0
injury\t-2.1
injustice\t-2.4
innocent\t1.4
innovation\t1.7
insecure\t-1.6
insolvency\t-2.3
inspiration\t2.2
inspired\t2.1
inspiring\t2.3
instability\t-1.5
insufficient\t-1.4
insulted\t-2.2
integrity\t2.0
intimidate\t-2.1
invaluable\t2.1
invasion\t-2.2
invest\t0.8
irrational\t-1.5
irresponsible\t-1.9
irritate\t-1.9
isolated\t-1.3
jeopardize\t-2.0
jobless\t-1.9
joke\t0.9
joyful\t2.7
joyous\t2.8
jubilant\t2.7
justified\t1.1
kidnap\t-2.6
killed\t-3.1
kindness\t2.3
laugh\t2.2
laughing\t2.3
launder\t-2.1
lawsuits\t-1.8
layoff\t-2.0
layoffs\t-2.1
leadership\t1.4
legendary\t2.2
lethal\t-2.5
liar\t-2.6
liberate\t1.6
limited\t-0.8
litigation\t-1.5
lively\t1.8
lonely\t-1.9
losing\t-1.8
losses\t-1.9
lovable\t2.6
love\t3.2
loved\t2.9
lovely\t2.8
loves\t2.7
loving\t2.9
lows\t-1.2
lucrative\t2.0
luxurious\t1.9
luxury\t1.7
mourn\t-2.2
malicious\t-2.6
manipulation\t-2.0
masterpiece\t2.7
meltdown\t-2.5
memorable\t1.7
menace\t-2.2
merciful\t1.8
mercy\t1.5
merit\t1.6
mighty\t1.6
misconduct\t-2.2
misery\t-2.7
misfortune\t-2.1
mislead\t-1.9
misleading\t-2.0
missed\t-1.3
missing\t-1.4
mistakes\t-1.7
mistrust\t-1.9
misuse\t-1.7
momentum\t0.9
motivated\t1.8
motivation\t1.6
murder\t-3.4
murky\t-1.2
nasty\t-2.5
neglected\t-1.9
nightmare\t-2.7
notorious\t-1.7
nuisance\t-1.5
nurture\t1.7
obsolete\t-1.3
obstruct\t-1.7
offended\t-2.0
offensive\t-2.2
opportunities\t1.6
oppose\t-1.2
opposition\t-1.0
oppress\t-2.3
optimistic\t2.0
oust\t-1.6
outbreak\t-2.1
outperform\t1.8
outrage\t-2.5
overload\t-1.3
overlook\t-1.0
overpriced\t-1.6
oversight\t-0.9
overwhelm\t-1.4
overwhelmed\t-1.5
pain\t-2.3
painful\t-2.4
pandemic\t-2.6
paradise\t2.7
paralyze\t-2.2
passion\t2.0
passionate\t2.1
patient\t1.2
peaceful\t2.2
penalize\t-1.8
penalties\t-1.7
perfection\t2.7
perilous\t-2.2
perish\t-2.3
persecute\t-2.4
persevere\t1.6
pessimistic\t-1.8
plague\t-2.4
pleasant\t2.0
please\t1.3
pleased\t2.0
pleasure\t2.4
plummet\t-2.1
plunged\t-1.9
poison\t-2.6
polished\t1.5
pollute\t-2.1
pollution\t-2.0
powerful\t1.8
powerless\t-1.8
prevail\t1.5
privilege\t1.6
prize\t2.1
productive\t1.8
profitable\t2.0
profits\t1.7
prohibit\t-1.5
prominent\t1.4
promising\t1.9
promoted\t1.8
prosecute\t-1.9
prosperity\t2.4
prosperous\t2.3
protected\t1.4
protest\t-1.4
protests\t-1.4
proudly\t2.1
punished\t-2.1
punishment\t-2.2
quarrel\t-1.8
radiant\t2.2
rage\t-2.7
raid\t-1.9
rallied\t1.6
rebounded\t1.5
rebuild\t1.1
recall\t-1.0
recalled\t-1.1
recommend\t1.6
recommended\t1.6
recovered\t1.7
recovery\t1.8
redemption\t1.6
refund\t0.9
refused\t-1.5
regrettable\t-1.9
regrets\t-1.8
rejected\t-1.9
rejection\t-2.0
rejoice\t2.5
relaxed\t1.8
relentless\t-0.9
relieved\t1.8
remarkable\t2.2
renowned\t1.9
repair\t0.8
resent\t-1.9
resilient\t1.7
resolved\t1.4
respect\t2.0
respected\t2.1
restored\t1.5
restriction\t-1.3
restrictions\t-1.3
retreat\t-1.1
revenge\t-2.2
revive\t1.3
revoke\t-1.6
rewarded\t2.2
rewarding\t2.3
riot\t-2.4
risks\t-1.1
risky\t-1.4
rob\t-2.5
robbery\t-2.5
romantic\t2.1
rotten\t-2.3
rude\t-2.2
ruined\t-2.4
rumor\t-0.8
sabotage\t-2.5
sad\t-2.1
sadness\t-2.2
satisfaction\t2.0
satisfied\t1.9
scam\t-2.6
scandalous\t-2.3
scared\t-2.0
scarcity\t-1.4
screwed\t-2.2
seize\t-1.2
selfish\t-2.1
sensational\t2.1
serene\t2.0
settle\t0.6
settlement\t0.7
shady\t-1.8
shaky\t-1.2
shattered\t-2.3
shining\t2.0
shortfall\t-1.6
shot\t-1.9
sickness\t-2.1
signal\t0.1
sincere\t2.0
skeptical\t-1.3
skilled\t1.7
slander\t-2.3
slash\t-1.4
slashed\t-1.5
slid\t-0.9
slide\t-0.8
sluggish\t-1.4
smile\t2.2
smiling\t2.4
soar\t1.8
soared\t1.9
soaring\t1.9
sobering\t-1.2
solidarity\t1.6
soothing\t1.8
sophisticated\t1.6
spectacular\t2.5
splendid\t2.5
squeeze\t-1.1
stabilize\t1.2
stalled\t-1.3
starve\t-2.5
steady\t1.1
stellar\t2.3
stole\t-2.3
stolen\t-2.3
strained\t-1.4
strengthen\t1.6
strengthened\t1.6
stricken\t-1.9
strife\t-2.0
striking\t0.9
strongly\t1.0
stumble\t-1.3
sturdy\t1.3
succeeded\t1.9
successful\t2.2
successfully\t2.1
suck\t-2.1
sued\t-1.8
suffering\t-2.4
suffers\t-2.1
suicide\t-3.3
sunk\t-1.7
superb\t2.7
supported\t1.5
supportive\t1.9
supports\t1.4
surged\t1.6
surges\t1.5
surplus\t1.4
surrender\t-1.4
survival\t0.6
survive\t1.0
survived\t1.3
suspect\t-1.4
suspend\t-1.4
suspended\t-1.5
suspicion\t-1.6
suspicious\t-1.7
sustainable\t1.4
sympathy\t1.4
tanked\t-1.9
tariff\t-0.9
tension\t-1.5
terrified\t-2.7
terrorism\t-3.4
thankful\t2.2
thefts\t-2.1
theft\t-2.2
threaten\t-2.1
threatened\t-2.1
threats\t-2.0
thrilled\t2.6
thrilling\t2.4
thriving\t2.2
tired\t-1.4
tolerant\t1.4
torment\t-2.5
tornado\t-2.0
torture\t-3.0
tragic\t-2.7
tranquil\t1.9
transparency\t1.5
transparent\t1.3
trapped\t-2.0
trauma\t-2.5
treasure\t2.2
tremendous\t2.3
trendy\t1.2
tribute\t1.7
triumphant\t2.6
troubled\t-1.9
troubles\t-1.8
truce\t1.1
trusted\t2.1
trustworthy\t2.2
truth\t1.6
turbulent\t-1.6
turnaround\t1.2
tumble\t-1.5
tumbled\t-1.6
unacceptable\t-2.1
unbearable\t-2.4
unbelievable\t1.1
uncomfortable\t-1.5
undermine\t-1.8
understand\t0.9
undervalued\t-0.6
undesirable\t-1.7
uneasy\t-1.4
unethical\t-2.3
unexpected\t-0.4
unforgettable\t1.8
unfortunate\t-1.9
unfriendly\t-1.8
ungrateful\t-1.9
unify\t1.4
unimpressed\t-1.4
uninspired\t-1.3
unique\t1.3
united\t1.8
unjust\t-2.2
unlawful\t-2.2
unlucky\t-1.6
unpleasant\t-1.9
unpopular\t-1.5
unprecedented\t0.3
unprofitable\t-1.8
unreliable\t-1.8
unsafe\t-1.9
unsatisfied\t-1.7
unsettled\t-1.2
unsuccessful\t-1.8
unsure\t-1.0
untrustworthy\t-2.1
unwanted\t-1.6
unwelcome\t-1.6
upbeat\t1.8
upheaval\t-1.8
uprising\t-1.3
uproar\t-1.8
upside\t1.2
vacation\t1.9
valiant\t2.1
valuable\t1.9
vandalism\t-2.2
versatile\t1.4
vice\t-1.8
vicious\t-2.7
victim\t-2.0
victims\t-2.1
victorious\t2.5
vigilant\t0.9
vigorous\t1.4
vindicate\t1.2
virtue\t1.9
virtuous\t2.1
vision\t1.3
visionary\t2.0
vitality\t1.8
volatility\t-1.2
vowed\t0.4
warned\t-1.5
warning\t-1.6
warnings\t-1.6
warmth\t2.0
weaken\t-1.5
weakened\t-1.5
weakness\t-1.7
weary\t-1.4
welcomed\t1.9
welfare\t1.1
wellbeing\t1.9
whine\t-1.5
wicked\t-2.4
widen\t-0.2
wildfire\t-1.9
winning\t2.4
wins\t2.5
wisdom\t2.1
withdraw\t-0.9
withdrawal\t-1.1
witty\t1.9
woes\t-1.8
won\t2.7
worried\t-1.8
worries\t-1.7
worrying\t-1.9
worsen\t-2.1
worsened\t-2.2
worthless\t-2.3
worthwhile\t1.7
worthy\t1.9
wounded\t-2.2
wrongdoing\t-2.2
yearn\t-0.5
"""

#: Second expansion tier (r4): remaining inflections of the tagged
#: base stems (past/gerund/3sg for verbs, -ly adverbs with irregular
#: overrides, noun plurals — each carrying its stem's valence, the
#: published lexicon's own convention) plus a new-vocabulary tier of
#: curated entries on the same [-4, 4] scale. Same curated-estimate
#: status as the blocks above; a real vader_lexicon.txt drop-in still
#: wins (see _load_dropin).
LEXICON_DATA_EXTENSION2 = """\
abandoning	-1.9
abusing	-3.2
abusively	-3.2
abysmal	-3
accepting	1.1
accepts	1.1
accidentally	-1.2
accolade	2.1
accolades	2.1
accomplishes	1.8
accomplishing	1.8
accomplishments	1.9
accusations	-1.7
accuses	-1.8
accusing	-1.8
achievements	2
achieves	1.8
achieving	1.8
adept	1.6
admiration	2
admires	2.2
admiring	2.2
adopted	0.7
adopting	0.7
adopts	0.7
adorably	2.4
adores	2.9
adoring	2.9
advantages	1.7
adventures	1.6
adversaries	-1.2
adversely	-1.5
affluent	1.9
aggressively	-0.6
aghast	-2
agile	1.3
agreeably	1.7
agreeed	1.5
agreeing	1.5
agreements	1.4
ailing	-1.8
alarmingly	-1.8
alarms	-1.4
allegation	-1.3
allegations	-1.3
allies	1.2
ally	1.2
amazingly	2.8
ambitions	1.3
ample	1.2
amuses	1.7
angrily	-2.3
animosities	-1.9
annihilate	-2.9
annihilated	-2.9
annoys	-1.9
anxiously	-1.9
apologies	0.2
apologized	0.4
apologizes	0.4
apologizing	0.4
appallingly	-2.7
appealed	1.3
appealing	1.3
appeals	1.3
applauded	2
applauding	2
applauds	2
appreciates	1.9
appreciating	1.9
apprehension	-1.5
approving	1.8
ardent	1.6
argued	-1.4
argues	-1.4
arguing	-1.4
arrested	-1.4
arresting	-1.4
arrests	-1.4
arrogance	-1.9
arrogant	-1.9
arson	-2.6
assassinate	-3.1
assassination	-3.1
assaulted	-2.6
assaulting	-2.6
assaults	-2.6
asset	1.3
assets	1.3
assures	1.2
assuring	1.2
astoundingly	2.3
atrociously	-3
atrocities	-3.1
attacking	-2.1
attracted	1.7
attracting	1.7
attractively	1.9
attracts	1.7
audacious	0.9
austerity	-1.4
avalanche	-1.6
averted	-0.4
averting	-0.4
averts	-0.4
avoided	-1.2
avoiding	-1.2
avoids	-1.2
awarding	2.5
awe	1.8
awfully	-2.9
backfire	-1.8
backfired	-1.8
backlash	-1.8
badly	-2.5
baffle	-1.2
baffled	-1.2
bailouts	-1.1
bamboozle	-1.5
banish	-1.9
banished	-1.9
bankruptcies	-2.6
bankrupted	-2.6
bankrupting	-2.6
bankrupts	-2.6
banning	-1.8
bargains	1.5
barriers	-1.1
bearable	0.6
bearably	0.6
beating	1.1
beats	1.1
beautifully	2.9
beautify	1.8
belittle	-1.9
belittled	-1.9
bellwether	0.6
benevolent	2.2
betraying	-3
betrays	-3
bitterly	-1.8
blames	-2.2
blaming	-2.2
bleakly	-1.9
blesses	1.8
blessings	2.6
blindside	-1.7
blindsided	-1.7
blissful	2.9
blockbuster	2.1
blocking	-1.3
bloodshed	-3
blossom	1.8
blossoming	1.8
blundered	-1.7
blundering	-1.7
blunders	-1.7
boastful	-1.1
bogus	-1.9
boldly	1.3
bolster	1.4
bolstered	1.4
bombard	-1.6
bombarded	-1.6
bonanza	2
boon	1.8
boosting	1.7
bores	-1.1
boringly	-1.3
botch	-1.9
botched	-1.9
bothered	-1.3
bothering	-1.3
bothers	-1.3
bottlenecks	-1.2
bounced	0.8
bounces	0.8
bouncing	0.8
boycotted	-1.5
boycotting	-1.5
boycotts	-1.5
bravado	-0.4
bravely	2.3
bravery	2.3
breached	-1.9
breaches	-1.9
breaching	-1.9
breakthrough	2.2
breakthroughs	2.2
bribe	-2.2
bribed	-2.2
bribery	-2.3
brighten	1.6
brightened	1.6
brightly	1.9
brilliantly	2.8
brink	-1
brisk	0.8
broken	-1.6
brutally	-3
bubbles	-0.8
bungle	-1.8
bungled	-1.8
buoyant	1.6
burdening	-1.5
burdens	-1.5
burglar	-1.9
burglary	-2.1
burning	-1.5
burnout	-1.9
burns	-1.5
busted	-1.8
busting	-1.8
busts	-1.8
calamities	-2.6
calmly	1.3
calmness	1.4
calms	1.3
canceled	-1.3
canceling	-1.3
cancellations	-1.4
cancels	-1.3
candid	1.2
capably	1.6
capitulate	-1.4
capitulation	-1.4
captivated	1.9
captivates	1.9
captivating	1.9
carefully	1.3
carelessly	-1.5
carnage	-3.1
casualties	-2.4
catalyst	0.9
catastrophes	-3.4
catastrophically	-3.5
celebrates	2.7
celebrating	2.7
celebrations	2.7
celebratory	2.1
challenged	-0.4
challenges	-0.4
champions	2.4
chances	0.8
chaotic	-1.9
charities	1.8
charmed	1.9
charmingly	2.2
charms	1.9
cheating	-2.4
cheats	-2.4
cheered	2.3
cheerfully	2.5
cheering	2.3
cheery	1.9
cherished	2.3
cherishes	2.3
cherishing	2.3
choke	-1.7
choked	-1.7
clashed	-1.7
clashes	-1.7
clashing	-1.7
classily	1.8
cleanly	1.7
cleverly	2
clumsy	-1.2
coerce	-1.7
coerced	-1.7
coercion	-1.8
cohesive	1.1
collapsing	-1.1
collateral	-0.4
collided	-1.4
collides	-1.4
colliding	-1.4
comfortably	1.7
comforted	1.9
comforts	1.9
commendable	2
commending	2
commends	2
compassionately	2.2
competently	1.5
competitively	0.8
complacent	-1
complaining	-1.6
complains	-1.6
complimented	1.9
complimenting	1.9
compliments	1.9
comprehensive	0.9
compromise	0.3
compromised	-1.4
conceded	-0.6
concedes	-0.6
conceding	-0.6
conciliatory	0.9
condemning	-2.2
condemns	-2.2
condone	-0.8
confess	-0.9
confession	-0.9
confidently	2.2
conflicts	-1.8
confused	-1.2
confuses	-1.2
confusing	-1.2
congenial	1.7
congratulated	2.5
congratulates	2.5
congratulating	2.5
connive	-1.8
conniving	-1.8
conquered	1.4
conquering	1.4
conquers	1.4
conscientious	1.6
consolation	0.6
console	0.9
consoled	0.9
conspiracies	-2.1
constrained	-1.1
constraining	-1.1
constrains	-1.1
constraints	-1.1
constructive	1.4
contagion	-1.8
contaminated	-2.1
contaminates	-2.1
contaminating	-2.1
contention	-1
contentious	-1.3
contentment	1.9
contracts	0.2
contradictions	-1.1
controversies	-1.5
convenient	1.2
conveniently	1.2
convicting	-2.2
convicts	-2.2
convivial	1.7
cordial	1.6
counterfeit	-1.9
courageously	2.3
courteously	1.8
courtesy	1.5
coveted	1.4
cowards	-2
cozily	1.9
crackdown	-1.3
crafty	-0.3
crashing	-1.6
craved	0.6
created	1.4
creates	1.4
creating	1.4
creatively	1.9
credibility	1.3
credibly	1.5
crestfallen	-2
cries	-1.9
crimes	-2.5
criminals	-2.5
cripples	-2.4
crippling	-2.4
crisises	-3.1
criticizes	-1.7
criticizing	-1.7
critics	-1.1
cruelly	-2.8
crumble	-1.7
crumbled	-1.7
crumbling	-1.7
crushes	-1.5
crushing	-1.5
crying	-1.9
culpable	-1.5
culprit	-1.5
cumbersome	-1.1
curtail	-1
curtailed	-1
cynically	-1.6
dampened	-1
dampening	-1
dampens	-1
dangerously	-2.3
dangers	-2.4
darkly	-1.4
dashing	1.6
dazzle	1.9
dazzled	1.9
dazzling	2.1
deals	0.6
dearly	1.7
debacles	-2.4
debilitating	-2.2
debts	-1.6
decadent	-0.7
deceit	-2
deceitful	-2.1
deceives	-2.4
deceiving	-2.4
decimate	-2.5
decimated	-2.5
declined	-1.4
declines	-1.4
declining	-1.4
defamation	-2
defame	-2
defaulted	-1.4
defaulting	-1.4
defaults	-1.4
defeating	-1.8
defeats	-1.8
defects	-1.8
defended	0.6
defending	0.6
defends	0.6
defiant	-0.9
deficits	-1.6
defrauded	-2.5
defrauding	-2.5
defrauds	-2.5
deft	1.3
defunct	-1.4
degraded	-1.9
degrades	-1.9
degrading	-1.9
delaying	-1.2
deliciously	2.3
delightfully	2.7
delinquency	-1.7
delinquent	-1.7
deluge	-1.2
demanded	0.2
demanding	0.2
demands	0.2
demean	-1.8
demeaning	-1.8
demolished	-1.9
demolishes	-1.9
demolishing	-1.9
demote	-1.5
demoted	-1.5
denounce	-1.8
denounced	-1.8
denying	-1.4
deplete	-1.4
depleted	-1.4
deplorable	-2.4
deplore	-2
deport	-1.5
deported	-1.5
depresses	-2.2
depressing	-2.2
derailed	-1.6
derailing	-1.6
derails	-1.6
derelict	-1.5
deride	-1.7
derided	-1.7
desecrate	-2.2
desolate	-2
desperately	-2
despised	-2.6
despises	-2.6
despising	-2.6
destitute	-2.3
destroying	-2.6
destroys	-2.6
destructively	-2.6
deteriorated	-2
deteriorates	-2
deteriorating	-2
devastates	-3.1
devastatingly	-3.1
devout	1.2
dexterous	1.3
died	-2.9
dies	-2.9
dilemmas	-1.2
diligence	1.5
diligently	1.6
diminish	-1.1
diminished	-1.1
din	-0.6
direly	-2.1
dirtily	-1.8
disadvantages	-1.6
disagreeed	-1.4
disagreeing	-1.4
disagrees	-1.4
disappoints	-2.2
disapproved	-1.9
disapproves	-1.9
disapproving	-1.9
disarray	-1.6
disasters	-3.1
discord	-1.6
discounted	0.8
discounting	0.8
discounts	0.8
discouraged	-1.8
discourages	-1.8
discouraging	-1.8
discriminated	-2.2
discriminates	-2.2
discriminating	-2.2
disdain	-1.8
disenchanted	-1.5
disgraced	-2.4
disgraces	-2.4
disgracing	-2.4
disgruntled	-1.7
disgusted	-2.6
disgusts	-2.6
dishearten	-1.8
disheartened	-1.8
disheartening	-1.8
dishonestly	-2.4
dishonesty	-2.1
disillusioned	-1.5
disingenuous	-1.6
disliked	-1.7
dislikes	-1.7
disliking	-1.7
dismally	-2.1
dismay	-1.7
dismayed	-1.7
dismisses	-1.2
dismissing	-1.2
disparage	-1.8
disparaging	-1.8
disputed	-1.6
disputes	-1.6
disputing	-1.6
disqualified	-1.7
disqualifies	-1.7
disqualifying	-1.7
disregarded	-1.5
disregarding	-1.5
disregards	-1.5
disrupted	-1.5
disrupting	-1.5
disrupts	-1.5
dissent	-0.9
distorted	-1.5
distorting	-1.5
distorts	-1.5
distractions	-1.1
distraught	-2.1
distressed	-2.4
distresses	-2.4
distressing	-2.4
distrusted	-2.1
distrusting	-2.1
distrusts	-2.1
divine	2.3
dodgy	-1.4
dominated	0.4
dominates	0.4
dominating	0.4
donated	1.8
donates	1.8
donating	1.8
donations	1.9
dooming	-2.7
dooms	-2.7
dormant	-0.4
doubted	-1.4
doubting	-1.4
downbeat	-1.3
downcast	-1.7
downgrades	-1.6
downtrodden	-1.8
downturns	-1.9
drab	-1
draconian	-1.8
dragged	-1.1
dragging	-1.1
drags	-1.1
dreaded	-2.2
dreadfully	-2.7
dreading	-2.2
dreads	-2.2
dreamed	1.4
dreaming	1.4
dreams	1.4
dreary	-1.4
dropped	-1.1
dropping	-1.1
drops	-1.1
droughts	-1.9
drowned	-2.4
drowning	-2.4
drowns	-2.4
dubious	-1.4
dully	-1.6
dumped	-1.4
dumping	-1.4
dumps	-1.4
dwindle	-1.3
dwindled	-1.3
dwindling	-1.3
dynamically	1.2
dysfunctional	-1.8
eagerly	1.7
earned	1.7
earnestly	1.4
earning	1.7
earns	1.7
eased	1.3
eases	1.3
easily	1.9
easing	1.3
ebullient	2
eclipse	-0.3
ecstatically	3.1
edify	1.4
effectively	1.6
effervescent	1.7
efficiently	1.9
elation	2.6
elegantly	2.1
eloquent	1.7
elude	-0.8
emancipate	1.6
embargo	-1.2
embarrasses	-1.9
embezzle	-2.3
embezzled	-2.3
embezzlement	-2.4
embraced	1.5
embraces	1.5
embracing	1.5
emergencies	-2.2
eminently	1.1
empowered	1.9
empowering	1.9
empowers	1.9
enamored	2
encouraged	2.1
encourages	2.1
encouraging	2.1
endangered	-2.2
endangering	-2.2
endangers	-2.2
endearing	1.9
endeavor	0.9
endorses	1.6
endorsing	1.6
endured	-0.3
endures	-0.3
enduring	-0.3
energetically	1.8
enhances	1.5
enhancing	1.5
enlightened	1.9
enlightening	1.9
enlightens	1.9
enliven	1.5
enmity	-2
ennui	-1.2
enraged	-2.6
enrages	-2.6
enraging	-2.6
enriched	1.9
enriches	1.9
enriching	1.9
enthrall	1.8
enthralled	1.8
enthusiastically	2.4
entice	1
enticing	1.2
envied	-0.6
epidemic	-2.2
equitable	1.3
eroded	-1.5
erodes	-1.5
eroding	-1.5
erratic	-1.3
erudite	1.4
escalated	-1.3
escalates	-1.3
escalating	-1.3
escaped	-0.4
escapes	-0.4
escaping	-0.4
evacuated	-1.8
evacuates	-1.8
evacuating	-1.8
evaded	-1.4
evades	-1.4
evading	-1.4
evilly	-3.3
eviscerate	-2.3
exacerbate	-1.5
exacerbated	-1.5
exaggerated	-1.1
exaggerates	-1.1
exaggerating	-1.1
exalt	1.9
exalted	1.9
exasperate	-1.7
exasperated	-1.7
exceeded	1.6
exceeding	1.6
exceeds	1.6
excelled	2
excellently	2.7
excelling	2
excels	2
exceptionally	2.4
excites	2.4
excitingly	2.4
excused	-0.4
excuses	-0.4
excusing	-0.4
exemplary	2.2
exhilarating	2.4
exodus	-1.1
exonerated	1.2
exonerates	1.2
exonerating	1.2
expanded	1.2
expanding	1.2
expands	1.2
expelled	-1.9
expelling	-1.9
expels	-1.9
expensively	-1
expertise	1.5
exploited	-1.7
exploiting	-1.7
exploits	-1.7
explosions	-2
exposed	-0.9
exposes	-0.9
exposing	-0.9
exquisite	2.5
extol	1.8
extorted	-2.5
extorting	-2.5
extortion	-2.4
extorts	-2.5
extraordinarily	2.3
exuberant	2.2
fabulously	2.6
failed	-2.3
failures	-2.5
fairly	1.6
faithfully	2.1
fakely	-1.9
falsely	-1.6
fanciful	0.7
fantastically	2.6
farce	-1.5
fatalities	-2.9
fatality	-2.9
fatally	-2.8
faults	-1.7
favored	1.7
favoring	1.7
favors	1.7
feared	-2.2
fearfully	-2.1
fearing	-2.2
fearless	1.5
feebly	-1.5
felony	-2.4
fertile	1
fervent	1.3
fester	-1.6
festive	1.9
fiery	-0.4
fights	-1.6
filth	-2
filthy	-1.9
finely	0.8
fining	0.8
flabbergasted	-0.5
flatter	1
flattering	1.3
flaws	-1.8
fled	-1.7
fleeing	-1.7
flees	-1.7
flimsy	-1.2
flooded	-1.8
flooding	-1.8
floods	-1.8
flop	-1.7
flopped	-1.7
flourished	2.2
flourishes	2.2
fluke	-0.5
foolishly	-1.8
forbade	-1.5
forbidding	-1.5
forbids	-1.5
foreclose	-1.9
foreclosure	-2
forfeited	-1.5
forfeiting	-1.5
forfeits	-1.5
forgives	1.6
forgiving	1.6
forlorn	-1.9
formidable	0.9
forsake	-1.8
forsaken	-1.9
fortunately	2.1
fortunes	2.2
fought	-1.6
foully	-2.1
fractious	-1.3
fragilely	-1.3
frantic	-1.4
frauds	-2.8
fraudulently	-2.7
fraught	-1.4
freely	2.3
frenzied	-1.1
frenzy	-0.9
freshly	1.3
fret	-1.3
fretting	-1.3
frightened	-2.2
frightening	-2.2
frightens	-2.2
frivolous	-1
frugal	0.6
frustrates	-2.1
fulfilling	1.6
fulfills	1.6
fumbled	-1.3
fumbles	-1.3
fumbling	-1.3
furiously	-2.7
furor	-1.4
futilely	-1.7
gaining	1.6
galvanize	1.2
gem	1.8
generously	2.3
gently	1.9
genuine	1.6
genuinely	1.6
gladly	2
glee	2.3
gleeful	2.3
glitch	-1.3
glitches	-1.3
glitter	1.2
gloat	-1.1
gloomily	-1.9
gloriously	2.6
glum	-1.7
gouge	-1.8
gracefully	2
graciously	2.2
grandly	2.2
granting	1.2
grants	1.2
gratefully	2.4
gratifying	1.9
gravely	-1.9
greedily	-2.2
gridlock	-1.4
grievance	-1.5
grievances	-1.5
grieve	-2.2
grieving	-2.2
grimly	-2
grit	1
grossly	-1.9
grudge	-1.6
gruesome	-2.8
guaranteeed	1.3
guaranteeing	1.3
guarantees	1.3
gutsy	1.1
hail	1.2
hailed	1.4
halted	-1
halting	-1
halts	-1
hampered	-1.3
hampering	-1.3
hampers	-1.3
hapless	-1.4
harass	-2.2
harassed	-2.2
harassment	-2.3
hardy	1
harmfully	-2.3
harming	-2.4
harmonious	1.9
harms	-2.4
harshly	-1.9
haunted	-1.9
haunting	-1.9
haunts	-1.9
hazardously	-2.2
hazards	-2
headwind	-1.1
headwinds	-1.1
heals	1.8
healthily	2.1
heartened	1.7
heartening	1.8
heartless	-2.2
heartwarming	2.4
heist	-1.7
helpfully	1.8
helping	1.7
helplessly	-2
heroic	2.3
heroism	2.4
heros	2.6
hesitantly	-1
hiccup	-0.8
highlights	1.2
hilariously	2.3
hindered	-1.5
hindering	-1.5
hinders	-1.5
hoard	-1
hoax	-1.7
hollowly	-1.1
homicide	-3.1
hone	0.9
honestly	2.3
honorable	2
honoring	2.4
honors	2.4
hooray	2.3
hoped	1.9
hopefully	1.9
hopelessly	-2.6
hoping	1.9
horrendously	-2.9
horribly	-2.7
horrifically	-3
hostilely	-2.3
hubris	-1.3
humanitarian	1.8
humbly	1.1
humiliated	-2.5
humiliates	-2.5
humiliating	-2.5
hurdle	-0.9
hurdles	-0.9
hurricane	-1.9
hyped	-0.3
hypes	-0.3
hyping	-0.3
ideally	2.2
ignorantly	-1.9
ignores	-1.4
ignoring	-1.4
illegally	-2.6
illicit	-1.8
illustrious	1.9
immaculate	2.2
imminent	-0.6
immorally	-2.3
impaired	-1.6
impairing	-1.6
impairs	-1.6
impasse	-1.3
impatiently	-1.2
impeach	-1.8
impeachment	-1.8
impeccably	2.3
impeded	-1.3
impedes	-1.3
impeding	-1.3
impending	-0.8
imperfectly	-1.2
imperil	-1.9
importantly	1.2
impossibly	-1.6
impoverished	-2.1
impresses	1.9
impressing	1.9
impressively	2.2
imprisoned	-2.1
imprisoning	-2.1
imprisons	-2.1
improvements	1.8
inadequately	-1.7
incentives	1.2
incidents	-1.1
inclement	-1.1
incompetently	-2.2
increases	0.8
increasing	0.8
incriminate	-1.9
indebted	-0.9
indicting	-1.9
indicts	-1.9
indignant	-1.4
indomitable	1.5
inefficiently	-1.5
ineptly	-1.8
infamous	-1.8
infected	-1.9
infecting	-1.9
infects	-1.9
inferiorly	-1.8
infestation	-2
infringe	-1.4
infringement	-1.5
ingenious	2
ingenuity	1.9
inhumane	-2.4
injures	-2
injuring	-2
innocently	1.4
insecurely	-1.6
insidious	-1.9
insolvencies	-2.3
inspires	2.3
insulting	-2.2
insults	-2.2
insurgency	-1.9
intact	0.8
intelligently	2.3
intimidated	-2.1
intimidates	-2.1
intimidating	-2.1
intrepid	1.4
intrigue	0.5
intriguing	1
inundate	-1.2
invalidly	-1.4
invaluably	2.1
invested	0.8
investing	0.8
invests	0.8
invigorate	1.7
invigorating	1.8
irate	-2
ire	-1.8
irk	-1.3
irked	-1.3
irrationally	-1.5
irresponsibly	-1.9
irritated	-1.9
irritates	-1.9
irritating	-1.9
jackpot	2.2
jaded	-1.2
jeopardized	-2
jeopardizes	-2
jeopardizing	-2
jitters	-1.3
jittery	-1.3
jokes	0.9
jovial	2
jubilation	2.6
keenly	1.5
kidnaped	-2.6
kidnaping	-2.6
kidnaps	-2.6
killing	-3.4
kills	-3.4
kindly	2.4
kudos	2.1
lacked	-1.3
lacking	-1.3
lackluster	-1.4
lacks	-1.3
lagged	-1
lagging	-1
lags	-1
lament	-1.7
lamented	-1.7
landslide	-0.9
languish	-1.6
languishing	-1.6
larceny	-2.2
laud	1.8
lauded	1.8
laughed	2.2
laughs	2.2
laundered	-2.1
laundering	-2.1
launders	-2.1
lavish	1
lax	-0.9
lazily	-1.7
leaked	-1.2
leaking	-1.2
leaks	-1.2
legendarily	2.2
lethally	-2.5
lethargic	-1.3
liabilities	-1.2
liability	-1.2
liars	-2.6
liberated	1.6
liberates	1.6
liberating	1.6
lied	-2.4
lies	-2.4
limbo	-1
limiting	-0.8
limits	-0.8
lionize	1.4
loathe	-2.4
loathing	-2.4
looming	-1
loot	-1.8
looted	-1.8
looting	-1.9
loses	-2
lovingly	2.4
loyally	2.1
luckily	2.4
lucratively	2
lull	-0.5
luminous	1.6
lurch	-1.1
lure	-0.3
lurking	-1.2
luxuriously	1.9
lying	-2.4
magnificently	2.9
majestic	2.2
malaise	-1.6
malfeasance	-2.1
malfunction	-1.7
maliciously	-2.6
malpractice	-2.1
mangle	-1.9
mangled	-1.9
manipulated	-1.7
manipulates	-1.7
manipulating	-1.7
manslaughter	-2.8
mar	-1.3
marred	-1.4
marvel	1.8
marvelous	2.6
massacre	-3.3
masterpieces	2.7
mastery	1.7
maturely	1.4
maul	-2.2
mayhem	-2.2
meager	-1.1
meddle	-1.2
mediocrely	-1.1
memorably	1.7
menaced	-2.2
menaces	-2.2
menacing	-2.2
mend	1.1
mending	1.1
mercifully	1.8
merciless	-2.2
merry	2
mesmerize	1.6
mesmerizing	1.7
messes	-1.6
mightily	1.6
milestone	1.4
milestones	1.4
miracles	2.8
miserably	-2.7
mishap	-1.4
mishaps	-1.4
misleaded	-1.9
misleads	-1.9
misses	-1
misstep	-1.3
missteps	-1.3
mistreat	-2
mistreated	-2
mistreatment	-2.1
moan	-1.2
mocked	-1.8
mocking	-1.8
mocks	-1.8
momentous	1.6
morale	0.8
moratorium	-0.9
morbid	-1.9
moribund	-1.7
motivates	1.9
motivating	1.9
mourned	-2.2
mourning	-2.2
mourns	-2.2
muddle	-1.1
muddled	-1.1
mundane	-0.7
murdered	-3.4
murdering	-3.4
murders	-3.4
murkily	-1.2
mutiny	-1.8
nag	-1.3
nagging	-1.3
nastily	-2.5
neatly	1.7
nefarious	-2.1
negatively	-1.6
neglecting	-1.9
neglects	-1.9
nemesis	-1.4
nervously	-1.7
nicely	1.8
nightmares	-2.7
nimble	1.1
nobly	2.1
nosedive	-2
nostalgic	0.6
notoriously	-1.7
nourish	1.5
nourishing	1.5
nuisances	-1.5
nurtured	1.7
nurtures	1.7
nurturing	1.7
obliterate	-2.6
obliterated	-2.6
obsoletely	-1.3
obstacles	-1.4
obstinate	-1.2
obstructed	-1.7
obstructing	-1.7
obstructs	-1.7
odious	-2.2
offence	-1.5
offending	-2
offends	-2
offense	-1.3
offensively	-2.2
ominous	-1.8
onerous	-1.4
onslaught	-1.8
opportune	1.2
opposed	-1.2
opposes	-1.2
opposing	-1.2
oppressed	-2.3
oppresses	-2.3
oppressing	-2.3
optimistically	2
ordeal	-1.8
ornate	0.9
orphan	-1.4
orphaned	-1.5
ostracize	-1.9
ousted	-1.6
ousting	-1.6
ousts	-1.6
outages	-1.5
outbreaks	-2.1
outcry	-1.5
outlaw	-1.3
outlawed	-1.3
outperformed	1.8
outperforming	1.8
outperforms	1.8
outstandingly	2.7
overcame	1.6
overcomes	1.6
overcoming	1.6
overdue	-1
overjoyed	2.8
overloaded	-1.3
overloading	-1.3
overloads	-1.3
overlooked	-1
overlooking	-1
overlooks	-1
overrun	-1.2
oversupply	-0.9
overturn	-0.6
overturned	-0.6
overwhelming	-1.4
overwhelms	-1.4
painfully	-2.4
paltry	-1.2
pampered	0.8
pandemonium	-2
panicked	-2.5
panicking	-2.5
panics	-2.5
paragon	1.8
paralyzed	-2.2
paralyzes	-2.2
paralyzing	-2.2
paramount	1
pariah	-1.9
parole	-0.7
passionately	2.1
patiently	1.2
peacefully	2.2
penalized	-1.8
penalizes	-1.8
penalizing	-1.8
peppy	1.5
perfectly	2.7
perilously	-2.2
perished	-2.3
perishes	-2.3
perishing	-2.3
perjury	-2.2
perk	1.1
perks	1.1
pernicious	-2
perpetrator	-1.8
persecuted	-2.4
persecutes	-2.4
persecuting	-2.4
persevered	1.6
perseveres	1.6
persevering	1.6
perturbed	-1.3
pessimistically	-1.8
pessimists	-1.2
petrified	-2.2
picturesque	1.9
pinnacle	1.7
pitfall	-1.3
pitfalls	-1.3
pity	-1.2
plagued	-2.4
plagues	-2.4
plaguing	-2.4
pleasantly	2
pleases	1.3
pleasing	1.3
pleasures	2.4
plight	-1.6
ploy	-1.1
plucky	1.2
plummeted	-2.1
plummeting	-2.1
plummets	-2.1
plunges	-1.5
plunging	-1.5
poignant	0.6
poised	0.9
poisoned	-2.6
poisoning	-2.6
poisons	-2.6
polluted	-2.1
pollutes	-2.1
polluting	-2.1
pompous	-1.5
poorly	-2.1
popularly	2.1
positively	2.1
powerfully	1.8
powerhouse	1.6
powerlessly	-1.8
praised	2.4
praises	2.4
praising	2.4
precarious	-1.5
preciously	2.2
predicament	-1.4
premier	1.4
prettily	2
prevailed	1.5
prevailing	1.5
prevails	1.5
pristine	2
prizes	2.1
problems	-1.7
productively	1.8
proficient	1.5
profitably	2
profound	1.1
prohibited	-1.5
prohibiting	-1.5
prohibits	-1.5
prolific	1.4
prominently	1.4
promised	1.5
promises	1.5
promisingly	1.9
promotes	1.7
promoting	1.7
prosecuted	-1.9
prosecutes	-1.9
prosecuting	-1.9
prospered	2.4
prospering	2.4
prosperously	2.3
prospers	2.4
protecting	1.4
protects	1.4
protested	-1.4
protesting	-1.4
prowess	1.6
prudence	1.3
prudently	1.5
pummel	-1.9
pummeled	-1.9
punishes	-2.1
punishing	-2.1
purge	-1.4
quagmire	-1.6
qualm	-1
qualms	-1
quarreled	-1.8
quarreling	-1.8
quarrels	-1.8
quell	-0.6
quintessential	1
quits	-1.2
quitting	-1.2
radiantly	2.2
raided	-1.9
raiding	-1.9
raids	-1.9
rallies	1.3
rallying	1.3
rampage	-2.3
rampant	-1.3
ransack	-2
ransom	-1.8
rapture	2.4
rattle	-1.1
rattled	-1.2
ravage	-2.2
ravaged	-2.2
rave	1.7
ravishing	2.1
rebounding	1.3
rebounds	1.3
rebuilded	1.1
rebuilding	1.1
rebuilds	1.1
rebuke	-1.6
rebuked	-1.6
recalling	-1
recalls	-1
recessions	-2.2
recklessly	-1.9
recoup	1
recoveries	1.8
recovering	1.4
recovers	1.4
rectify	1
redeem	1.3
redeemed	1.4
refreshing	1.7
refunded	0.9
refunding	0.9
refunds	0.9
refuses	-1.4
refusing	-1.4
regal	1.4
regretted	-2
regretting	-2
reinvigorate	1.7
rejecting	-1.8
rejects	-1.8
rejoiced	2.5
rejoices	2.5
rejoicing	2.5
rejuvenate	1.8
rejuvenated	1.8
relentlessly	-0.9
reliably	2
relish	1.5
remarkably	2.2
remorse	-1.4
renege	-1.6
repaired	0.8
repairing	0.8
repairs	0.8
reprehensible	-2.4
reprieve	1
reprimand	-1.6
reprisal	-1.8
rescued	1.9
rescues	1.9
rescuing	1.9
resented	-1.9
resenting	-1.9
resents	-1.9
resigned	-1.2
resigning	-1.2
resigns	-1.2
resiliently	1.7
resolves	1.4
resolving	1.4
resounding	1.3
resourceful	1.6
respecting	2
respects	2
restores	1.5
restoring	1.5
restricted	-1.2
restricting	-1.2
restricts	-1.2
resurgence	1.4
resurgent	1.4
retaliate	-1.6
retaliation	-1.7
retreated	-1.1
retreating	-1.1
retreats	-1.1
revel	1.5
revere	1.9
revered	1.9
revile	-2.1
reviled	-2.1
revived	1.3
revives	1.3
reviving	1.3
revoked	-1.6
revokes	-1.6
revoking	-1.6
revolt	-1.5
rewards	2.2
richly	2.1
ridicule	-1.8
ridiculed	-1.8
rift	-1.2
rigged	-1.8
rigorous	0.8
rioted	-2.4
rioting	-2.4
riots	-2.4
rises	1
rising	1
risked	-1.1
riskily	-1.4
risking	-1.1
robbed	-2.5
robbing	-2.5
robs	-2.5
robustly	1.6
romantically	2.1
rose	1
rosy	1.4
rottenly	-2.3
rout	-1.6
routed	-1.6
ruckus	-1.2
rudely	-2.2
ruining	-2.6
ruins	-2.6
rumors	-0.8
ruthless	-2
sabotaged	-2.5
sabotages	-2.5
sabotaging	-2.5
sadly	-2.1
safely	1.9
salvage	0.7
salvaged	0.8
sanction	-1.1
sanctions	-1.2
satisfies	1.9
satisfying	1.9
saved	2.2
saves	2.2
saving	2.2
savvy	1.4
scammed	-2.6
scamming	-2.6
scams	-2.6
scandalously	-2.3
scandals	-2.3
scares	-2.2
scaring	-2.2
scathing	-1.9
scorn	-1.8
scorned	-1.8
scourge	-2.1
scramble	-0.8
scrupulous	1.3
seamless	1.4
securely	1.7
seethe	-1.7
seething	-1.7
seized	-1.2
seizes	-1.2
seizing	-1.2
selfishly	-2.1
sensationally	2.1
serenely	2
serenity	2
setbacks	-1.7
settled	0.6
settlements	0.7
settles	0.6
settling	0.6
severely	-1.9
shackle	-1.5
shadily	-1.8
shakily	-1.2
shambles	-1.8
shimmering	1.3
shined	1.8
shines	1.8
shipwreck	-1.9
shocked	-1.8
shocking	-1.8
shocks	-1.8
shoddy	-1.6
shortages	-1.6
shortchange	-1.5
shortfalls	-1.6
showdown	-0.6
shrank	-1
shrewd	0.9
shrinking	-1
shrinks	-1
shun	-1.5
shunned	-1.5
signals	0.1
sincerely	2
skeptically	-1.3
skirmish	-1.3
skyrocket	1.6
skyrocketed	1.6
slain	-2.5
slandered	-2.3
slandering	-2.3
slanders	-2.3
slashes	-1.4
slashing	-1.4
slay	-2.2
sleek	1.3
slided	-0.8
slides	-0.8
sliding	-0.8
slowly	-1
sluggishly	-1.4
slumped	-1.6
slumping	-1.6
slumps	-1.6
smartly	2
smear	-1.7
smeared	-1.7
smiled	2.2
smiles	2.2
smoothly	1.4
smuggle	-1.7
smuggling	-1.8
snag	-1
snags	-1
soars	1.8
solace	0.9
solidly	1.3
solved	1.5
solves	1.5
solving	1.5
somber	-1.4
sophisticatedly	1.6
spat	-1.1
spearhead	1
spectacularly	2.5
spite	-1.7
spiteful	-2
splendidly	2.5
sprightly	1.5
spur	0.8
spurred	0.9
squabble	-1.2
squander	-1.7
squandered	-1.7
squeezed	-1.1
squeezes	-1.1
squeezing	-1.1
stabilized	1.2
stabilizes	1.2
stabilizing	1.2
stably	1.3
stagnation	-1.5
stalemate	-1.2
stalwart	1.3
stampede	-1.4
standout	1.5
starved	-2.5
starves	-2.5
starving	-2.5
staunch	0.9
steadfast	1.4
steadily	1.1
stealing	-2.4
steals	-2.4
stellarly	2.3
sterling	1.6
stifle	-1.4
stifled	-1.4
stigma	-1.6
stimulated	1.4
stimulates	1.4
stimulating	1.4
stoic	0.5
strand	-1.2
stranded	-1.5
strengthening	1.6
strengthens	1.6
strengths	1.9
stressed	-1.9
stresses	-1.9
stressing	-1.9
striked	-1.2
strikes	-1.2
stringent	-0.7
struggled	-1.9
struggles	-1.9
struggling	-1.9
stumbled	-1.3
stumbles	-1.3
stumbling	-1.3
stupidly	-2.4
sturdily	1.3
subdue	-0.8
subdued	-0.9
sublime	2.1
subpoena	-1.2
subsidies	0.6
subsidy	0.6
succeeding	2.2
succeeds	2.2
sucked	-2.1
sucking	-2.1
sucks	-2.1
suffered	-2.4
sullen	-1.5
sumptuous	1.7
superbly	2.7
superiorly	2.1
superly	2.9
supporting	1.7
surging	1.4
surpassed	1.6
surpasses	1.6
surpassing	1.6
surpluses	1.4
surrendered	-1.4
surrendering	-1.4
surrenders	-1.4
survives	1
surviving	1
suspected	-1.4
suspecting	-1.4
suspects	-1.4
suspending	-1.4
suspends	-1.4
suspiciously	-1.7
sweetly	2
swindle	-2
swindled	-2
tailspin	-1.9
taint	-1.6
tainted	-1.7
tantalizing	1.2
tariffs	-0.9
tarnish	-1.6
tarnished	-1.6
tearful	-1.6
tedious	-1.2
teetering	-1.3
tenacious	1.2
tenacity	1.4
tensions	-1.5
tepid	-0.8
terribly	-2.1
terrifically	2.7
terrorize	-2.8
terrorized	-2.8
thanked	1.9
thanking	1.9
thanks	1.9
thoughtful	1.8
threatening	-2.1
threatens	-2.1
thrift	0.7
thrifty	0.8
thrived	2.3
thrives	2.3
thug	-1.9
thwart	-1.1
thwarted	-1.2
timid	-0.9
tirade	-1.6
toil	-0.8
topple	-1.4
toppled	-1.4
tormented	-2.5
tormenting	-2.5
torments	-2.5
torrid	-0.6
tortured	-3
tortures	-3
torturing	-3
tout	0.8
touted	0.9
tragedies	-3
tragically	-2.7
traitor	-2.2
tranquilly	1.9
transparently	1.3
treacherous	-2.1
treachery	-2.2
treasured	2.2
treasures	2.2
treasuring	2.2
tremendously	2.3
trepidation	-1.5
tributes	1.7
trickery	-1.7
triumphantly	2.2
triumphed	2.7
triumphing	2.7
triumphs	2.7
troubling	-2
truant	-1.2
truces	1.1
trusting	2.1
trusts	2.1
tumbles	-1.5
tumbling	-1.5
tumult	-1.5
tumultuous	-1.5
turbulently	-1.6
tyranny	-2.4
unbearably	-2.4
unblemished	1.6
uncomfortably	-1.5
undaunted	1.2
underdog	-0.4
undermined	-1.8
undermines	-1.8
undermining	-1.8
underperform	-1.5
underperformed	-1.5
undue	-1
unease	-1.3
uneasily	-1.4
unethically	-2.3
unexpectedly	-0.4
unfairly	-2.2
unfazed	0.6
unfit	-1.4
unflappable	1.1
unforgiving	-1.6
unfortunately	-1.9
unhappily	-2.2
unified	1.4
unifies	1.4
unifying	1.4
unjustly	-2.2
unlawfully	-2.2
unluckily	-1.6
unpleasantly	-1.9
unravel	-1.3
unraveled	-1.3
unrest	-1.6
unrivaled	1.8
unsafely	-1.9
unscathed	0.9
unscrupulous	-2
unstably	-1.6
unsuccessfully	-1.8
untenable	-1.5
uplifted	2.1
uplifting	2.1
uplifts	2.1
uproarious	0.8
upsets	-1.9
upsetting	-1.9
upstanding	1.5
urgently	-1.1
usefully	1.8
uselessly	-1.9
usurp	-1.5
utopia	2
valiantly	2.1
valuably	1.9
valued	1.4
values	1.4
valuing	1.4
vandal	-1.8
vanquish	-1
vanquished	-1.1
vendetta	-1.9
venerable	1.5
vengeance	-1.9
venom	-2
venomous	-2.1
versatilely	1.4
vex	-1.4
vexed	-1.4
vibrantly	1.9
viciously	-2.7
victories	2.6
victoriously	2.5
vigilantly	0.9
vigorously	1.4
vile	-2.6
vilified	-2
vilify	-2
villain	-2
vindicated	1.2
vindicates	1.2
vindicating	1.2
vindictive	-1.9
violated	-2.2
violates	-2.2
violating	-2.2
violently	-2.9
virtuoso	1.9
visions	1.3
vitally	1.2
vivacious	1.8
void	-1
volatilely	-1.3
voracious	-0.4
vouch	1.1
vow	0.5
vulnerably	-1.5
wane	-1
waning	-1.1
warns	-1.4
wary	-1.1
wasted	-1.8
wastes	-1.8
wasting	-1.8
watchdog	0.2
wayward	-1.2
weakening	-1.5
weakens	-1.5
weakly	-1.9
weaknesses	-1.7
wearily	-1.4
welcomes	1.9
welcoming	1.9
whined	-1.5
whines	-1.5
whining	-1.5
wholesome	1.9
wickedly	-2.4
widened	-0.2
widening	-0.2
widens	-0.2
wilt	-1.2
wilted	-1.2
windfall	1.9
winsome	1.6
wisely	2.1
wistful	-0.5
wittily	1.9
woeful	-2
wonderfully	2.9
worthily	1.9
worthlessly	-2.3
worthwhilely	1.7
wrath	-2.2
wrecked	-2.1
wrecking	-2.1
wrecks	-2.1
wretched	-2.3
wrongly	-2.1
yearned	-0.5
yearning	-0.5
yearns	-0.5
zealous	0.9
zest	1.7
"""

#: Third expansion tier (r4, session 2): internet slang/interjections
#: (lol/wtf/ugh family — headline-adjacent informal English the [A-Za-z\']+ 
#: tokenizer CAN see; emoticons are deliberately excluded because the
#: tokenizer cannot match them), plus broad everyday sentiment vocabulary:
#: emotions, evaluation, news/finance verbs (plummet/rebound/downgrade),
#: morality, and weather/atmosphere terms. Same curated-approximation
#: basis as the earlier tiers (see module docstring) — the drop-in loader
#: still wins wherever a real vader_lexicon.txt exists.
LEXICON_DATA_EXTENSION3 = """\
abandonment	-2.0
abhorred	-2.5
abominable	-2.6
abundant	1.6
acceptance	1.6
acclaim	2.1
acclaimed	2.2
ache	-1.5
aching	-1.6
acquisition	0.5
agonized	-2.6
altruistic	2.1
amusement	1.7
angel	2.1
angelic	2.3
anguished	-2.6
argh	-1.5
astonishing	2.1
astounded	1.7
authentic	1.8
awesomely	3.0
backstabbing	-2.5
bah	-1.1
barbaric	-2.4
barren	-1.2
beauty	2.6
bizarre	-1.0
boo	-1.5
booming	2.0
booyah	2.0
boredom	-1.3
bothersome	-1.6
bountiful	1.9
bravo	2.6
breathtaking	2.6
breezy	0.9
brighter	1.9
brightest	2.2
brilliance	2.2
brittle	-0.9
bungling	-1.8
buyout	0.6
callous	-2.0
carelessness	-1.7
censure	-1.7
charitable	2.1
chastise	-1.6
chastised	-1.6
cheap	0.5
cheaper	0.8
cheapest	0.9
cheater	-2.4
chipper	1.8
chivalrous	1.7
cleaner	1.4
cleanest	1.8
climb	1.1
climbed	1.1
climbing	1.0
climbs	1.0
cloudy	-0.5
cold	-0.9
coldly	-1.2
concerning	-1.4
considerate	2.0
content	1.6
contented	1.9
cooler	0.9
coolest	1.9
cowardice	-1.9
cowardly	-2.0
cranky	-1.5
crap	-2.0
crater	-1.6
cratered	-1.7
crazier	-1.3
craziest	-1.4
crazy	-1.2
creep	-1.6
creepy	-1.9
crises	-2.4
crude	-1.5
crummy	-1.8
cure	2.0
cured	1.9
cures	1.8
curiosity	1.2
curious	1.3
curse	-2.0
cursed	-2.1
curses	-1.9
damned	-2.2
dang	-1.4
darker	-1.1
darkest	-1.6
darkness	-1.2
darn	-1.3
deaths	-2.8
decayed	-1.6
decrease	-1.1
decreased	-1.2
decreasing	-1.2
decrepit	-1.8
defamed	-2.1
degenerate	-1.8
delights	2.2
delirious	-0.4
demeaned	-1.8
demon	-2.1
demonic	-2.4
demoralized	-2.0
demoralizing	-2.1
dependable	1.9
despairing	-2.6
despondent	-2.5
determination	1.7
detest	-2.6
detested	-2.5
devil	-2.1
difficulties	-1.5
difficulty	-1.5
dilapidated	-1.7
dim	-0.6
dingy	-1.3
dirtier	-1.7
disagreed	-1.3
disagreement	-1.4
disapproval	-1.8
disastrous	-2.9
disease	-2.1
diseases	-2.0
disintegrate	-1.8
disintegrated	-1.8
disloyal	-1.9
dismissive	-1.5
disorderly	-1.4
disorganized	-1.4
disparaged	-1.8
disreputable	-1.9
dissatisfaction	-1.8
dissatisfied	-1.8
disturb	-1.5
disturbed	-1.7
disturbs	-1.4
dividend	1.0
dividends	1.0
downgraded	-1.8
downsizing	-1.4
duh	-1.0
dumb	-2.2
duplicitous	-2.1
dystopia	-2.1
easier	1.6
easiest	1.8
eerie	-1.2
effectiveness	1.5
efficiency	1.6
ego	-0.8
egotistical	-1.9
embarrassment	-1.7
empathetic	1.9
enchanting	2.4
encouragement	2.0
enjoyable	2.2
enjoyment	2.0
euphoric	3.0
eww	-2.0
exhausting	-1.6
exhaustion	-1.6
faked	-1.8
falter	-1.5
faltered	-1.6
faltering	-1.6
fascinated	2.0
fascination	1.8
faster	1.4
fastest	1.6
ffs	-2.3
flounder	-1.5
floundered	-1.5
foggy	-0.5
fool	-1.9
fools	-1.9
forgiveness	1.9
frail	-1.2
freak	-1.6
freaky	-1.3
freed	1.8
freefall	-1.9
friend	2.2
friends	2.1
frightful	-2.1
frown	-1.4
frowning	-1.5
funnier	2.0
funniest	2.2
gallant	1.9
gaudy	-1.1
geez	-0.9
ghastly	-2.4
giddy	1.6
gift	1.9
gifts	1.8
gladness	2.1
gleam	1.3
gleaming	1.5
glittering	1.4
glorified	1.6
glorify	1.9
glowing	2.0
goofy	0.6
gratified	2.0
greater	1.5
greatest	3.2
greatly	1.4
grimy	-1.5
grin	1.8
grinning	1.8
groundbreaking	2.1
grumpy	-1.6
haha	2.0
handsome	2.2
hard	-0.4
harder	-0.8
hardest	-1.0
harmless	0.9
hassle	-1.5
health	1.1
heartbroken	-3.0
heavenly	2.6
hehe	1.6
hellish	-2.5
heroes	2.4
hideous	-2.5
holy	1.4
honesty	2.6
horrid	-2.5
horrified	-2.9
horrifying	-2.8
hot	0.8
hottest	1.0
hug	2.1
hugged	1.9
hugs	2.0
humility	1.6
humorous	1.7
hurrah	2.6
icky	-1.6
idiot	-2.3
idiotic	-2.4
imperfection	-1.2
implode	-2.0
imploded	-2.0
impolite	-1.8
inconsiderate	-1.9
inconsolable	-2.6
inconvenience	-1.6
inconvenient	-1.5
incredible	2.6
incredibly	2.3
indecent	-1.8
ineffective	-1.4
insane	-1.7
insanity	-1.8
insecurity	-1.5
insensitive	-1.8
inspirational	2.4
intelligence	1.8
interested	1.6
interesting	1.7
inventive	1.9
investigation	-0.8
irritable	-1.7
jealous	-1.8
jealousy	-1.8
jeez	-0.9
jolly	2.2
joyfully	2.7
joys	2.4
jump	0.8
jumped	0.9
jumping	0.7
jumps	0.8
junky	-1.6
just	0.3
kiss	1.9
kissed	1.8
kisses	1.8
languished	-1.6
laughter	2.2
legal	0.9
lewd	-1.7
livid	-2.8
lmao	2.0
loathed	-2.6
lol	1.8
loneliness	-1.9
loser	-2.0
losers	-1.9
lousy	-2.1
loyalty	2.1
luck	1.8
lunatic	-2.0
lush	1.6
madness	-1.8
magnanimous	2.0
malevolent	-2.4
maniac	-2.0
manipulative	-2.1
masterful	2.4
meh	-0.9
mellow	1.3
merger	0.4
merrily	2.2
messy	-1.3
miffed	-1.3
modest	1.3
modesty	1.4
morose	-2.1
mournful	-2.2
murderer	-3.0
nah	-0.6
narcissist	-2.0
narcissistic	-2.0
nastier	-2.2
nauseating	-2.4
nervousness	-1.5
nicer	1.9
nicest	2.2
nope	-0.9
nosedived	-2.0
obscene	-2.2
odd	-0.5
oddly	-0.6
omg	1.3
oops	-1.0
orderly	1.1
organized	1.4
ouch	-1.6
overvalued	-1.2
painless	1.2
pains	-1.9
parties	1.3
party	1.7
patriot	1.6
patriotic	1.5
peeved	-1.4
pest	-1.5
pfft	-1.1
phenomenal	2.9
phew	0.9
philanthropic	2.0
placid	1.4
playful	1.9
playfully	1.8
plentiful	1.6
pointless	-1.7
polite	1.9
politely	1.7
politeness	1.9
poorer	-1.9
poorest	-2.2
power	1.2
powered	0.7
prettier	1.9
prettiest	2.2
pride	1.4
principled	1.8
prison	-2.2
probe	-0.7
problematic	-1.8
profane	-1.9
protection	1.4
psycho	-2.2
putrid	-2.4
quick	1.2
quickly	1.1
rainy	-0.6
ramshackle	-1.4
recommendation	1.3
recommends	1.5
refined	1.7
relaxing	1.9
reliability	1.7
reprimanded	-1.6
repulsive	-2.7
resentment	-2.0
respectful	1.9
restructuring	-0.5
revolting	-2.6
revolutionary	1.9
richer	1.8
richest	2.0
risen	1.1
rofl	2.2
rough	-1.3
roughly	-0.5
rudeness	-2.0
rundown	-1.5
sacred	1.6
saddened	-2.0
sadder	-2.1
saddest	-2.5
sadistic	-2.8
safety	1.4
savage	-2.1
savings	1.4
scarce	-1.0
scarred	-1.8
scary	-2.2
scheming	-1.7
scold	-1.5
scolded	-1.6
security	1.1
selfishness	-2.1
selfless	2.1
selflessness	2.1
sensitive	0.9
shadow	-0.6
shadowy	-0.9
shameful	-2.2
shiny	1.3
silly	-0.2
sin	-1.9
sinful	-2.0
sinister	-2.2
skillful	2.1
skittish	-1.0
sleazy	-2.0
sloppy	-1.5
slower	-1.2
slowest	-1.4
smarter	1.8
smartest	2.1
smh	-1.4
sob	-1.8
sobbing	-1.9
soft	0.9
soothe	1.7
soothed	1.6
sorrowful	-2.3
sparkle	1.8
sparkling	1.8
sparse	-0.7
spiral	-0.9
spiraled	-1.1
spirited	1.6
spooky	-1.0
squalid	-2.1
stale	-1.2
stingy	-1.5
storm	-1.1
stormy	-1.1
strange	-0.5
strangely	-0.7
stressful	-1.9
stronger	2.0
strongest	2.3
stuck	-1.3
stunning	2.4
stupidity	-2.4
subpar	-1.7
successes	2.5
sunny	1.9
sunshine	2.0
surprised	1.0
surprising	0.9
tacky	-1.5
tailwinds	1.1
takeover	0.2
tank	-1.5
taunt	-1.8
taunted	-1.8
tears	-1.2
tender	1.8
tenderness	1.9
testy	-1.3
thief	-2.2
thoughtfully	1.9
thoughtless	-1.8
thunder	-0.6
tidy	1.3
topnotch	2.3
trashy	-1.9
traumatized	-2.7
treason	-2.6
true	1.8
truthful	2.0
turbulence	-1.4
ugh	-1.7
uglier	-2.1
ugliest	-2.6
unattractive	-1.7
unbelievably	1.1
uncaring	-1.9
uncertainty	-1.4
unhappiness	-2.0
unhealthy	-1.8
unkind	-1.8
unworthy	-1.8
upgraded	1.7
useable	1.1
vain	-1.4
vanity	-1.3
villains	-2.1
violence	-2.9
vulgar	-2.0
warfare	-2.5
warm	1.6
warmly	1.8
wars	-2.7
wasteland	-1.6
weaker	-1.7
weakest	-2.0
wealthy	1.7
weep	-1.9
weeping	-1.9
weird	-0.7
weirdo	-1.4
well	1.1
wept	-1.8
whoa	0.9
windfalling	1.4
windfalls	1.9
winners	2.6
wonder	1.3
wonders	1.4
woohoo	2.8
worsening	-1.9
wound	-1.9
wounds	-1.9
wow	2.8
wretchedness	-2.4
wtf	-2.7
yay	2.4
yeah	1.2
yep	1.2
yikes	-1.1
yucky	-1.9
yup	1.1
zesty	1.5
"""

#: Fifth expansion tier (r4): sensory/taste, relationships, work and
#: macroeconomy vocabulary, disaster/conflict news terms, British
#: spelling variants of included stems, and the slang spellings the
#: published lexicon is known for (luv/gr8/sux family). Same curated
#: basis as earlier tiers.
LEXICON_DATA_EXTENSION4 = """\
abrasive	-1.5
aced	2.2
affluence	1.6
amateur	-0.6
appetizing	1.9
aromatic	1.3
bland	-1.0
blizzard	-1.3
breakup	-1.9
bullied	-2.3
cautious	0.4
colour	0.0
crisp	1.2
cuddle	2.0
cuddly	1.9
darling	2.4
deadline	-0.7
deflation	-1.1
delectable	2.4
democracy	1.5
democratic	1.2
demotion	-1.8
derogatory	-1.9
destabilize	-1.6
destabilized	-1.6
dictator	-2.1
dictatorship	-2.3
diploma	1.5
distasteful	-1.7
divorced	-1.7
earthquake	-2.0
emancipation	1.9
enslave	-2.6
enslaved	-2.6
estranged	-1.6
evicted	-2.1
eviction	-2.1
expert	1.6
extravagant	-0.4
extremism	-2.2
extremist	-2.1
fascism	-2.6
fascist	-2.5
favourite	2.0
fearlessness	1.8
firing	-1.9
flavorful	1.9
flirt	1.1
flunk	-1.9
flunked	-2.0
fml	-2.3
foreclosures	-2.1
fragrant	1.5
ftw	2.0
genocide	-3.3
gr8	2.1
graduate	1.7
graduated	1.8
graduation	1.9
heatwave	-1.3
helplessness	-2.1
hired	1.6
hiring	1.2
honour	2.2
honourable	2.2
hopefulness	1.8
hopelessness	-2.5
humour	1.7
humourous	1.7
imho	0.3
immune	1.0
immunity	1.2
imprudent	-1.5
inedible	-2.1
inoffensive	0.8
insufferable	-2.1
intimacy	1.6
intimate	1.2
intolerable	-2.1
juicy	1.3
labour	-0.4
laudable	2.0
liberation	2.0
luv	2.4
manageable	1.0
marvellous	2.9
mastered	1.9
meritless	-1.6
meritorious	1.9
mouthwatering	2.2
neglectful	-1.9
neighbour	0.9
noob	-1.2
novice	-0.3
objectionable	-1.7
obnoxious	-2.1
oppression	-2.4
oppressive	-2.3
opulent	1.4
overworked	-1.7
pls	0.3
plz	0.3
praiseworthy	2.2
professional	1.4
promotion	1.9
quarantine	-1.4
radicalized	-1.8
rebuilt	1.4
recklessness	-1.8
reek	-1.8
refresh	1.5
refreshed	1.7
refugee	-1.2
refugees	-1.3
renew	1.4
renewal	1.5
renewed	1.5
repugnant	-2.4
restoration	1.4
revival	1.5
rigour	0.8
romance	2.2
savory	1.6
scholarship	1.9
scrumptious	2.5
slavery	-2.9
smelly	-1.6
solvent	1.1
soulmate	2.5
sour	-1.1
splendour	2.5
stability	1.4
stagflation	-1.9
stalker	-2.4
stalking	-2.2
stench	-2.0
stimulus	0.9
stink	-1.8
stinky	-1.8
sux	-1.5
sweeter	1.7
sweetest	2.1
sweetheart	2.6
tasteless	-1.5
tasty	1.9
terrorist	-3.0
terrorists	-2.9
thx	1.4
tolerable	0.6
tsunami	-2.2
tyrant	-2.4
unappetizing	-1.7
unemployed	-1.9
unfaithful	-2.2
unmanageable	-1.5
unproductive	-1.5
unprofessional	-1.9
vaccinated	0.9
vaccine	0.9
vigour	1.5
warcrime	-3.0
wasteful	-1.7
widowed	-1.5
xoxo	2.5
yummy	2.4
zzz	-0.7
"""


#: token -> valence on [-4, 4] (builtin curated set: base + extension).
#: Sixth tier (r5): entries whose EXACT published valence is pinned by
#: the VADER README's ground-truth compound table (each value is forced
#: algebraically by a published compound + the rule constants — see
#: tests/test_text.py::test_vader_published_compound_parity), so these
#: are evidence-backed, not recalled. The emoticon example pins
#: sure + ":)" + ":D" = 5.6; the per-token split (1.3 / 2.0 / 2.3) is
#: curated. Keys are stored lowercase (":d") because the scorer —
#: like NLTK — lowercases the token before lookup; the ALL-CAPS
#: emphasis on ":D" comes from the raw token's case, not the key.
#: r6 additions, same evidence standard: ``shit`` = -2.6 is forced by
#: the published "Most automated sentiment analysis tools are shit."
#: compound (-0.5574 = -2.6/sqrt(2.6²+15)); ``compelling`` = 0.9 is
#: forced CONSISTENTLY by three published Roger-Dodger compounds
#: (0.2944 most+booster, -0.1695 least-negation, 0.2263 at-least); and
#: the curated ``lol`` recall (1.6) is corrected to 1.8, the value the
#: published "Today only kinda sux! But I'll get by, lol" compound
#: (0.5249) forces through the but-clause/damper/exclamation algebra.
LEXICON_DATA_EXTENSION5 = """\
uncompelling\t-0.9
sure\t1.3
:)\t2.0
:d\t2.3
shit\t-2.6
compelling\t0.9
"""

_BUILTIN_LEXICON: dict[str, float] = {
    tok: float(val)
    for tok, val in (
        line.split("\t")
        for line in (LEXICON_DATA + LEXICON_DATA_EXTENSION
                     + LEXICON_DATA_EXTENSION2 + LEXICON_DATA_EXTENSION3
                     + LEXICON_DATA_EXTENSION4 + LEXICON_DATA_EXTENSION5).splitlines()
        if line
    )
}


def _load_dropin() -> dict[str, float] | None:
    """Load a real ``vader_lexicon.txt`` if one is present — the published
    MIT-licensed file cannot be fetched from this offline container, so
    the engine looks for a local copy at runtime and prefers it over the
    curated builtin set. Search order:

    1. ``$VADER_LEXICON_PATH`` (explicit override),
    2. the installed ``vaderSentiment`` package's bundled file,
    3. NLTK's unzipped data layout under ``$NLTK_DATA``/``~/nltk_data``.

    Single-token rows are kept — including emoticons, which the r5
    NLTK-faithful tokenizer (whitespace split + word±punc mapping, no
    letter regex) CAN produce — mirroring NLTK's own loader. Multiword
    rows are dropped: lookup is per-token in NLTK too, so they are
    unreachable there as well. Rows with uppercase letters are dropped
    for the same reason (lookup lowercases the token first).
    Unparseable files are ignored (builtin wins) — a bad drop-in must
    not take down the scorer.
    """
    import os
    import re as _re

    paths: list[str] = []
    env = os.environ.get("VADER_LEXICON_PATH")
    if env:
        paths.append(env)
    try:  # vaderSentiment ships the file next to its module
        import vaderSentiment.vaderSentiment as _vs  # type: ignore

        paths.append(
            os.path.join(os.path.dirname(_vs.__file__), "vader_lexicon.txt")
        )
    except Exception:
        pass
    for root in (os.environ.get("NLTK_DATA"), os.path.expanduser("~/nltk_data")):
        if root:
            paths.append(
                os.path.join(
                    root, "sentiment", "vader_lexicon", "vader_lexicon.txt"
                )
            )
    tok_ok = _re.compile(r"^[^\sA-Z]+$")  # one token, no uppercase
    for path in paths:
        try:
            out: dict[str, float] = {}
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) < 2:
                        continue
                    tok = parts[0]
                    if not tok_ok.match(tok):
                        continue
                    out[tok] = float(parts[1])
            if out:
                return out
        except (OSError, ValueError):
            continue
    return None


#: The active lexicon: a local copy of the published file when available
#: (see _load_dropin), else the vendored curated set. Everything reading
#: LEXICON — the pandas-UDF scorer AND the generated SQL oracle — sees
#: the same dict, so the two lanes stay hash-identical either way.
LEXICON: dict[str, float] = _load_dropin() or _BUILTIN_LEXICON

#: Negation cues — the published NEGATE list verbatim (note: "no" is NOT
#: a VADER negator; tokens containing "n't" also negate, via the
#: include_nt rule in the scorer).
NEGATORS = frozenset({
    "aint", "arent", "cannot", "cant", "couldnt", "darent", "didnt",
    "doesnt", "ain't", "aren't", "can't", "couldn't", "daren't", "didn't",
    "doesn't", "dont", "hadnt", "hasnt", "havent", "isnt", "mightnt",
    "mustnt", "neither", "don't", "hadn't", "hasn't", "haven't", "isn't",
    "mightn't", "mustn't", "neednt", "needn't", "never", "none", "nope",
    "nor", "not", "nothing", "nowhere", "oughtnt", "shant", "shouldnt",
    "oughtn't", "shan't", "shouldn't", "uhuh", "wasnt", "werent", "uh-uh",
    "wasn't", "weren't", "without", "wont", "wouldnt", "won't",
    "wouldn't", "rarely", "seldom", "despite",
})

#: Degree modifiers — the published BOOSTER_DICT's single-token entries
#: (every value is exactly ±B_INCR): intensifiers add B_INCR to a
#: following valenced token's magnitude, dampeners subtract it.
INTENSIFIERS = frozenset({
    "absolutely", "amazingly", "awfully", "completely", "considerable",
    "considerably", "decidedly", "deeply", "effing", "enormous",
    "enormously", "entirely", "especially", "exceptional", "exceptionally",
    "extreme", "extremely", "fabulously", "flipping", "flippin", "frackin",
    "fracking", "fricking", "frickin", "frigging", "friggin", "fully",
    "fuckin", "fucking", "fuggin", "fugging", "greatly", "hella", "highly",
    "hugely", "incredible", "incredibly", "intensely", "major", "majorly",
    "more", "most", "particularly", "purely", "quite", "really",
    "remarkably", "so", "substantially", "thoroughly", "total", "totally",
    "tremendous", "tremendously", "uber", "unbelievably", "unusually",
    "utter", "utterly", "very",
})
DAMPENERS = frozenset({
    "almost", "barely", "hardly", "kinda", "kindof", "kind-of", "less",
    "little", "marginal", "marginally", "occasional", "occasionally",
    "partly", "scarce", "scarcely", "slight", "slightly", "somewhat",
    "sorta", "sortof", "sort-of",
})

#: BOOSTER_DICT's multiword keys — unreachable by single-token lookup
#: (exactly as in NLTK), they act only through the idiom bigram check,
#: which ADDS the constant B_DECR when a preceding 2/3-gram matches.
BOOSTER_PHRASES = frozenset({"kind of", "sort of", "just enough"})

#: Special-case idiom table: a contextual n-gram REPLACES the matched
#: token's valence outright ("the shit" is praise, etc.). This is the
#: subset of the published SPECIAL_CASE_IDIOMS whose exact values are
#: confidently known here — entries are never guessed (same curation
#: basis as the lexicon tiers); the drop-in of a real lexicon file does
#: not carry idioms, so texts hitting an omitted idiom are a documented
#: divergence.
SPECIAL_IDIOMS: dict[str, float] = {
    "the shit": 3.0,
    "the bomb": 3.0,
    "bad ass": 1.5,
    "yeah right": -2.0,
    "kiss of death": -1.5,
    "hand to mouth": -2.0,
}

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
#: "never so X" / "never this X" amplifies instead of negating
NEVER_SCALAR = 1.25
