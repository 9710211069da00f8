"""CPC wire-format code tables (packed; generated file — do not edit).

Length-limited Huffman encoding tables for the CPC compressed
serialization format: 22x256 high-entropy-byte tables, the 65-symbol
length-limited unary table, and the 16x56 sliding-phase column
permutations. These are public wire-format constants (the format is
defined by them; see cpc/CompressionData.java:22-38 in the reference,
which documents their generation by generateHuffmanCodes.ml /
generatePermutationsForSLIDING.ml). Regenerate with
scripts/extract_cpc_tables.py. Decoding tables are exact inverses
derived at import time in interop_cpc.py.
"""

import base64
import zlib

import numpy as np

_BLOB = (
    "c-rOJyLaQ(wFYoKBFVC>p>0`a#)?ASD30PN&QYx7ve42ZI~7xa9g8W5PQ?_!S}9nl5V|P=R4PG`g-Y;^B8B(>2@nK$N|h{Cv"
    "ScxZ?sov#dXIg5Z=B4`AFvm-^!xTc`y9lT<;=b~w-;BRXZ|71Y~}S${y>^d=SvHje@cscw7eot3+owLe<7YJs~N*Ok*38%-t"
    "gW?Q+=K{I!h9*Zu5rwTAG&Dc%y%&8lzp&XlE7Ld?gx#Si$HWNroRQ8eLm5hO}bXS=FGlA+#<P!MRigYeN*gq(W;iMWGYZ1$R"
    "dh`mvHQI+uhtHHAS^6?&vB_@*Lsg`r@}1%Xal6Gtvitcf@2$oj;c^d}>^G-*!;lOCy0{7H8*B-M#Mp@~+)NmvOl(Mh<8eqxk"
    "pCkBaL!cTM)!-UNh67*QoT3k_ct|ZMOP0ce^twSoBn^&~HHqzRht_`%F=5r;js|_`qG&GuP<s4GWSvfD)A!g3a^>ZVmoNMO>"
    "xn9oCb#ud<oulK{*cn@6Z`>KX<NkOwZjT4!-q;^^$HTEbrm0rSNm(f`)k(Rjerl9zrv|BB%1?Du!<3z(7p)8D!n*J-Iv4Im|"
    "6+8}z8GBeF8qt`#qh$upr@@<=hQm&PCKXWY5#O|+CCke_D=oN?&<K<KBd>KYv<a!_O3hE?sflqbltulT=%a1>+bdN+P<cFeK"
    "~U=!C!fvS%E)S+vMXa^FQR7zhS+A|3Zc{cj3RDF}xFrmYF;Ji^ziu|2q8p@Ymr#f`6O2!@s)E8@*}C@ZsM@4u<fzY15!tRcO"
    "%)>=nU+zX$&g{2TChV@074{}FP~hW~)pgdY5T<e&?G=nFJfV)_$HE-?LxiyT0I(nb!TKk-SK=}&Cr;79ZmR4!>P_&Z!dv*7Q"
    "Ms@8$OiyZXf4}EQbY(QV@A_vgdD5)_0oJAT;Kj$I`(9gAzgFE_0`CakPm!6~FL;tKYo94_z{sjKSUJ3jOMGlJaZ@mfqoh5j)"
    "dGI>)_l__J;NL-SyXgP^rDBZW--iDH?mhVXJIDe2hnFgHP%$WcTS?4-SE67gqa48BJ!bu{3nS#AjX5!Zdk;DAO*QO)%!aW43"
    "sL_UqyE>!{-<Wt|K%U=f4P*PSFHaFniFUJU)MaicaQ`3Op5xy81=s%^?x(!|4P*Vjj;cbgLka|x#}i=rp)b4^@Yp{{7LVSKS"
    "Td>&3WVi{{9<@tE^{8cUPR2meXXoByo*xp4hJ?uC|I?z`F%^=SbpAcw2Dy(ElA6yDOLrv}}yv--iDH{ykbZ{G@^$RE^;|<^j"
    "$H3ilTL9e7)`DR}S?&Vd6_=nEsE4gUe=MGyWyO91?BmVms%rohBQ4mvCW$iavufHv3^m~?54O@X&3fSL*WO2Qn_wHEvx&4NF"
    "h|7FdcM)MytBJ?jr{`JVe8u>RP|H`}QpM^iyjQqQ--{D_5<g+ULhwyK}-)8*}e+vH^`o9H#6a9}FZdg(Oms$T$^{D^Vu>av5"
    "^glZXkc+?_{=qqbIp2yE1ZN}ae|G-E**$0dUld00ZwmvsE13Tcp^IFE^Is3=zo~}vALl_h{|n*#hkG#pk%v3>uzt}0q#X7?{"
    "Dc12JgtNNcVXN|{|ECQ{=xi5F2ea=4d*{sh~|GYn*Wu%`lRun?oZm0e<kuCz+azDvpEp>`;mY5#Si^Y?0KHhu>TG0aE1eai}"
    "gSJJ@k18{x1Cc@E@W7+wdQt&wKFqjc(*$kNov}{?*98bkDze;}7RM{@<Vfm<OSMCGywr`8OW=(^}+Ty5*1apPD!R==;DQ^C0"
    "vuNB+ggzaIHl@A)_X)BQL3xxGVvW@|;9P0#a-dneLD=7qSNK2x^&H`03MOkLxbq}9x{uq$SjeV(ge&nvzXxkgr<>POi5H^fW"
    "jrO4H6DONZTN%vCa%pHjgV?|m{D#VWIgeGxDz}tzH49oBg7#pt9M>d+YaxTe*W1J5r_P;CSL`F_b)j$s$U0KI{!8CA28&qfs"
    "4(<S!;0YbU4bKIZ4R#`sdYFqa6=5dAM1*+=)A0B?kXJ}GE+u-n2l#n4(Iw5qkSnsyP;2215S$0t_dA*!o(17a5S|0!DG;6k;"
    "R*1r&HokL{WjtM0{(~aUxNQ`;6Km54*a+Iqrm?a{MX=b!+%30y{yVLcCZ7!gg<goJ4Y7a?=$~niD2I+!@$27`Iq6ZNB;H5ze"
    "<}|Qmk|$2L6>e^DjjH4fq$~UxU9M`r{7pxPSTQ`^zO#&nvh5tGE1{k$>fV_1_m4)6D-L;xqWq1^v%v0lVwHk(Sfb!hG2OMcn"
    "_91+K>KdAlNKvfh6s((*=-3tDIW|57Bl+tVugpI+krkNvKNxsN-(VZk1Ee51qUvHOpVwt+p(=pDoV0Ovwdr8V?_7yd&N=L77"
    "i$?l1!;K;gQ!Pt{a5AB&e`aiJ8egA){pXkBfNB?)>KZHMa`vk?lAM`%<{op)6{|EY{_P+a{DUrWAkNY3<56=PSpH)^fTx}`v"
    "XZt_%=S=wHjG*PC(4V;@3)l;S9H8fmh6Q&I{vFJLpzm=GKp%I3rs1DUv;zMwoBucmhVZx1|5Ppt*zeKvHNk?vha7a^ALt_s|"
    "9}2!!oQ0Ak%JG+e<kuikwX8t!p{HMbR7Py|MU7b&t^fsw2S_a{Bahr{hyr!!5q+;KhA{`_B|&Hf4Ez04xs;oeGogMiyQ=Z0+"
    "_dv1?U?-a?nj;?!OeV6RNa<9N6%u*!NoSchLV9{5|-0;P1je=zaJH`fv~ZtC4^6=k@<_<bTEdE0KTWmVYhsH{Un^11a?X=Pm"
    "ye>Bs!n_|X4V<i8*Jul!8^jmZDyzrmlK`+<M)#vk{;55)f@@_z$=whOZPza+8we~A5$`Lnsd4tMPT@F(_>lrORSAG~ok7%l9"
    "8MfU!49^`<%|8OSegNON#-N5MJ-tS`m_mP7U=6~=W!0v*$1Ng`RoBK`H|E3z812!^2anEbX1;N4mw{Y+GkcAF%;35ZsKl>&S"
    "_?Q3h^ItA~$n&4|Kl}c}`k#IOnHDyA*8kJuLa_gFwUyA{d=dGx^Zzio|4&Qo9f+O#$bp0XkL3XVw7eVo*V#KDj9ttF+~<uE="
    "0O|o!H&<)e(ZP;`(KazOM-JHh5e6t5cEIh!M~*c<5B;g-Ru9ndbj_Phxg1su7v(^HT1vx{ckzVzW=fLAAJ8)qwjx(==)zW{Q"
    "fu9Z-4(|-+kae!u)67|AKelBliAZG<=)A|5uD5GGSx)$F3-_J+ZbS3J!8$viILuN$_?g?0SXp9SGK#8!)ej-vNUAUNw3LDn{"
    "Rd^ynR^bk`ku_|f-Y_}iHOLC;@FnuET#Of|govv<JT?p*1v{Ja1C@4i3l|AVOiAN6mYNVE!nC;I+tElIS=-hU(iPF4xuf8k$"
    "&{|Nr=qv-t){=vN-`#^B7$38%l$Uxw)M*e!}j~x8q5BJbt4gHagpXOiv8U9Vpf_rf1XYYV-^>0M}wdnodeAoPEKAqi~Pp@P)"
    "GE00`$}2nkrIc5v`m`jM<(}-v#U$ptT$ihIS02i?Ot}{4a2Drr9nR(YCZ@jJ<VIYZ8*n|&=epdGvpGsz)S(vjXotGAPe-&(2"
    "ee0h+NDEkQ%YLIAr|qbN=zpm;*vfYkv18S9`Q++42eys(K4Lyy(qjjhIhvB1=+B}7oo@BgMRvJP^=_Z-u87^YlSaB@9X=|%+"
    "}o2?A}6pH9enM;dlA9%m%+C9*J?uR9FfQ_#N>~%1Wk+6jbB}v}?DWk45AKhWJ04%$zI#6!jbNB+@1qxH?z;<?WgKRFR8ZldF"
    "8l{tM~Zz4^>)n)z=a0SDrVcr0B>m&&CYX5maqD#>6f#0o3{p*54vN;{&dARR~mS7we}^QY^RL0)10FsN{ie}})UPZh4lnIEe"
    "E+}_OAY<h8THM5-F%q*nW`1#B}zrycG8{)b2QaliM`4e$Tyi|^*OZ5t8eo|p6pgnZD&(-77k(gA^a0-~10;bAUkpuM8jX7K&"
    "sNYEEm8>Ke@+wzD225He6!*hl$ex)qe_F*Iuuq$b5v_b^{)_3Et!L@Ey@kwddL0><=T|e^{AT7zTH|eLpWhH!7It~|jqg%D5"
    "T`o(&T}lmxxh7J#iViq|0OY|v+p=@iL00j*N_WvuMvkci3L-S)}K1#<>Hwn>sjoSxc@iviqXRTz`>6A3;EMp9((6hN%WC{5q"
    "7~3%zrsExA#0Vvo+7prWZ1cd%NO#=9RdbS(3K-*V0W6&Xf)8|112oz}|b#;ha_2H{hFG93vMeB3DZ)oS9S!?tKJ1Kj~q=^J6"
    "8_MGl6@!M)io7p^3^7-#+pZJMgl$NhgKmy9-Y5PToPJ;A5uzrvo)ds5CTq@Gt3ZP*XEVxmW?37<4SnDd|Q|9ea6SSBInq_LD"
    "Lq>8D^FZvhE&do0@E`7B8@yaKwu}?qyeC><%FXO*{{?*2BHh-Jg`mgQZfBlD@KYsJ4-9LZ(7qa))@Am)p_y11*?%A*I)IEDx"
    "_q)gHwqrrvuYRbDJ*?aQ{lmJiKV7(2_vs^bU;p8L-OguW-NH@XXOGqG{PAwxH=i#)sQdiUx^Mn;yKZ-FF(_NSRkrqc+3ufj%"
    "D(+#Y35<w7f;lE`<L(Q$oltnOSkLRpQ^(T26f+k`O(ZwSohKGx-Xxu`)(g~e~T~AK3W(5_0x6i2cO^6E#Iws{?@v$KAxSKjp"
    "{zWTldx5>NZy9o~+yW&C_+8tZpu<Te)Ai`DER1KbgN(_sO#dee^`#*6RHK0G4X`g#"
)

_raw = zlib.decompress(base64.b85decode(_BLOB))
_n_enc = 22 * 256 * 2
_n_unary = 65 * 2
ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE = np.frombuffer(
    _raw[:_n_enc], dtype="<u2"
).reshape(22, 256)
LENGTH_LIMITED_UNARY_ENCODING_TABLE_65 = np.frombuffer(
    _raw[_n_enc : _n_enc + _n_unary], dtype="<u2"
)
COLUMN_PERMUTATIONS_FOR_ENCODING = np.frombuffer(
    _raw[_n_enc + _n_unary :], dtype=np.uint8
).reshape(16, 56)
