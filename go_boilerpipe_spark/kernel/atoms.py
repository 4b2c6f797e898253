"""Known tag-name "atoms", mirroring golang.org/x/net/html/atom.

The reference's end-tag matching compares ``atom.Atom`` values
(/root/reference/content_handler.go:129-132): two *unknown* tag names both
map to atom 0 and therefore compare equal, while a known atom never equals
an unknown one. To replicate that malformed-HTML behavior we keep a set of
names that the atom package interns. The set below covers the HTML5 /
SVG-embedding element names plus the attribute & event names the atom
package also interns (tag names are what get looked up here, so attribute
atoms only matter for pathological markup like ``<onclick>``).
"""

_ELEMENTS = """
a abbr address area article aside audio b base basefont bdi bdo bgsound big
blink blockquote body br button canvas caption center cite code col colgroup
command data datalist dd del details dfn dialog div dl dt em embed fieldset
figcaption figure font footer foreignobject form frame frameset h1 h2 h3 h4 h5
h6 head header hgroup hr html i iframe image img input isindex kbd keygen label
legend li link listing main malignmark map mark marquee math menu menuitem meta
meter mglyph mi mn mo ms mtext multicol nav nobr noembed noframes noscript
object ol optgroup option output p param picture plaintext pre progress q rb
rp rt rtc ruby s samp script section select slot small source spacer span
strike strong style sub summary sup svg table tbody td template textarea tfoot
th thead time title tr track tt u ul var video wbr xmp
"""

# Attribute / event / misc names interned by the atom package (they share the
# same lookup table as element names).
_OTHER = """
accept accept-charset accesskey action allowfullscreen allowpaymentrequest
allowusermedia alt annotation annotation-xml applet aria-describedby
aria-label as async autocomplete autofocus autoplay challenge charset checked
cite class color cols colspan content contenteditable contextmenu controls
coords crossorigin data datetime default defer desc dir dirname disabled
download draggable dropzone enctype face for form formaction formenctype
formmethod formnovalidate formtarget headers height hidden high href hreflang
http-equiv icon id inputmode integrity is ismap itemid itemprop itemref
itemscope itemtype kind label lang list loop low manifest max maxlength media
mediagroup method min minlength multiple muted name nomodule nonce novalidate
onabort onafterprint onautocomplete onautocompleteerror onauxclick
onbeforeprint onbeforeunload onblur oncancel oncanplay oncanplaythrough
onchange onclick onclose oncontextmenu oncopy oncuechange oncut ondblclick
ondrag ondragend ondragenter ondragexit ondragleave ondragover ondragstart
ondrop ondurationchange onemptied onended onerror onfocus onhashchange oninput
oninvalid onkeydown onkeypress onkeyup onlanguagechange onload onloadeddata
onloadedmetadata onloadend onloadstart onmessage onmessageerror onmousedown
onmouseenter onmouseleave onmousemove onmouseout onmouseover onmouseup
onmousewheel ononline onoffline onpagehide onpageshow onpaste onpause onplay
onplaying onpopstate onprogress onratechange onrejectionhandled onreset
onresize onscroll onsecuritypolicyviolation onseeked onseeking onselect
onshow onsort onstalled onstorage onsubmit onsuspend ontimeupdate ontoggle
onunhandledrejection onunload onvolumechange onwaiting onwheel open optimum
pattern ping placeholder playsinline poster preload public radiogroup
readonly referrerpolicy rel required reversed rows rowspan sandbox scope
scoped seamless selected shape size sizes sortable sorted spellcheck src
srcdoc srclang srcset start step system target translate type typemustmatch
updateviacache usemap value width workertype wrap xmlns
"""

KNOWN_ATOMS = frozenset((_ELEMENTS + _OTHER).split())


def atom_of(name: str) -> str:
    """Return the "atom" for a tag name: the name itself if interned, else
    "" (the analog of atom 0 for unknown tags)."""
    return name if name in KNOWN_ATOMS else ""
