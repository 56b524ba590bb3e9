"""Scalar text-normalization ops.

Behavioral parity with the reference's scalar normalizers:

* :func:`rm_space`   ← ``rmSpace``            (/root/reference/rag/utils/__init__.py:37-40)
* :func:`str_q2b`    ← ``RagTokenizer._strQ2B``  (/root/reference/rag/nlp/rag_tokenizer.py:101-114)
* :func:`tradi2simp` ← ``RagTokenizer._tradi2simp`` (:116-117, HanziConv)
* :func:`find_codec` ← ``find_codec``         (/root/reference/rag/nlp/__init__.py:53-69)

``find_codec`` in the reference consults chardet first, but the chardet
branch only short-circuits ``ascii → utf-8`` — a result the try-decode
ladder reproduces anyway (utf-8 is first in the ladder and decodes any
ASCII blob), so the ladder-only implementation is observably identical
for every input; chardet is not required.

``tradi2simp`` in the reference delegates to HanziConv's full
traditional→simplified table.  That library is unavailable here, so
this module embeds a compact map of the high-frequency traditional
characters (DIVERGENCES.md §9); unmapped characters pass through
unchanged, exactly like HanziConv treats non-traditional input.
"""

from __future__ import annotations

import re

_RM_LEFT = re.compile(r"([^a-z0-9.,\)>]) +([^ ])", re.IGNORECASE)
_RM_RIGHT = re.compile(r"([^ ]) +([^a-z0-9.,\(<])", re.IGNORECASE)


def rm_space(txt: str) -> str:
    """Drop spaces that touch a non-latin/non-punct character on either
    side (de-spacing tokenized CJK text); latin word gaps survive."""
    txt = _RM_LEFT.sub(r"\1\2", txt)
    return _RM_RIGHT.sub(r"\1\2", txt)


def str_q2b(ustring: str) -> str:
    """Full-width (ideographic) characters → half-width ASCII.

    U+3000 (ideographic space) → U+0020; the FF01–FF5E block shifts
    down by 0xFEE0; everything else passes through unchanged.
    """
    out = []
    for ch in ustring:
        code = ord(ch)
        if code == 0x3000:
            code = 0x0020
        else:
            code -= 0xFEE0
        if code < 0x0020 or code > 0x7E:
            out.append(ch)
        else:
            out.append(chr(code))
    return "".join(out)


# High-frequency traditional → simplified pairs.  A pragmatic subset of
# the HanziConv table: common function words, measure words and the
# characters that appear in legal/technical prose the laws/book
# chunkers target.  One-to-one char map; unmapped chars pass through.
_T2S_PAIRS = (
    "萬万與与醜丑專专業业叢丛東东絲丝丟丢兩两嚴严喪丧個个豐丰臨临為为麗丽舉举"
    "麼么義义烏乌樂乐喬乔習习鄉乡書书買买亂乱爭争於于虧亏雲云亙亘亞亚產产畝亩"
    "親亲褻亵億亿僅仅從从侖仑倉仓儀仪們们價价眾众優优夥伙會会傴伛傘伞偉伟傳传"
    "傷伤倀伥倆俩傖伧偽伪佇伫體体餘余傭佣僉佥俠侠侶侣僥侥偵侦側侧僑侨儈侩儕侪"
    "儂侬俁俣儔俦儼俨倫伦隻只債债傾倾偉伟僂偻賃赁傑杰僨偾僕仆價价儷俪儸罗償偿"
    "優优儲储儻傥兌兑兒儿兗兖黨党蘭兰關关興兴茲兹養养獸兽囅冁內内岡冈冊册寫写"
    "軍军農农馮冯衝冲決决況况凍冻淨净涼凉減减湊凑凜凛幾几鳳凤鳧凫憑凭凱凯擊击"
    "氹凼鑿凿芻刍劃划劉刘則则剛刚創创刪删別别剗刬剄刭劊刽劌刿劇剧辦办務务勱劢"
    "動动勵励勸劝勞劳勢势勁劲勳勋猛勐勝胜匯汇區区醫医華华協协單单賣卖盧卢臥卧"
    "衛卫卻却廠厂廳厅歷历厲厉壓压厭厌厙厍參参靉叆靆叇雙双發发變变敘叙疊叠葉叶"
    "號号嘆叹嘰叽籲吁後后嚇吓呂吕嗎吗噸吨聽听啟启吳吴嘸呒囈呓嘔呕嚦呖唄呗員员"
    "咼呙嗆呛嗚呜詠咏嚨咙嚀咛噝咝響响啞哑噠哒嘵哓嗶哔噦哕噲哙嚕噜啢唡喚唤問问"
    "啓启啗啖售售唚吣喎呙啟启國国圖图圓圆團团園园壙圹場场壞坏塊块堅坚壇坛壢坜"
    "壩坝塢坞墳坟墜坠垻坝垵埯塏垲堊垩墊垫埡垭墶垯壋垱塒埘堝埚塹堑墮堕"
    "壯壮聲声殼壳壺壶壼壸處处備备複复夠够頭头誇夸奪夺奮奋獎奖奧奥妝妆婦妇媽妈"
    "嫵妩嫗妪媯妫姍姗姦奸娛娱婁娄嬋婵嬌娇孌娈娘娘婭娅嫻娴嬰婴嬸婶媼媪孫孙學学"
    "孿孪寧宁寶宝實实寵宠審审憲宪宮宫寬宽賓宾寢寝對对尋寻導导壽寿將将爾尔塵尘"
    "嘗尝層层屆届屬属屢屡屜屉履履嶼屿歲岁豈岂嶇岖崗岗峴岘嵐岚島岛嶺岭嶽岳崠岽"
    "巋岿嶄崭嶸嵘巒峦幣币帥帅師师幃帏帳帐簾帘幟帜帶带幀帧幫帮幬帱幗帼冪幂幹干"
    "並并廣广莊庄慶庆廬庐廡庑庫库應应廟庙龐庞廢废開开異异棄弃張张彌弥彎弯歸归"
    "當当錄录彥彦徹彻徑径後后徠徕禦御憶忆懺忏憂忧愾忾懷怀態态慫怂憮怃慪怄悵怅"
    "愴怆憐怜總总懟怼懌怿戀恋恆恒懇恳惡恶慟恸懨恹愷恺惻恻惱恼惲恽悅悦愨悫懸悬"
    "慳悭憫悯驚惊懼惧慘惨懲惩憊惫愜惬慣惯憤愤憒愦願愿懾慑懶懒戇戆戔戋戲戏戧戗"
    "戰战戶户紮扎撲扑扡扦執执擴扩捫扪掃扫揚扬擾扰撫抚拋抛摶抟摳抠掄抡搶抢護护"
    "報报擔担擬拟攏拢揀拣擁拥攔拦擰拧撥拨擇择掛挂摯挚攣挛挾挟撓挠擋挡撟挢掗挜"
    "撻挞挾挟搗捣捨舍捲卷撈捞損损撿捡換换搵揾揮挥摑掴擲掷撣掸摻掺摜掼揹背攬揽"
    "撳揿攙搀擱搁摟搂攪搅攜携攝摄攄摅擺摆搖摇擯摈攤摊撐撑撓挠數数斂敛斃毙敵敌"
    "斕斓斷断無无舊旧時时曠旷暘旸昇升晝昼顯显晉晋曬晒曉晓曖暧暈晕暉晖暫暂曆历"
    "術术樸朴機机殺杀雜杂權权條条來来楊杨榪杩傑杰極极構构樅枞樞枢棗枣櫪枥梘枧"
    "棖枨槍枪楓枫梟枭檸柠檉柽梔栀柵栅標标棧栈櫛栉櫳栊棟栋樹树櫨栌櫟栎橋桥樺桦"
    "檜桧槳桨樁桩夢梦檮梼棶梾檢检欞棂槨椁櫝椟槧椠欏椤橢椭樓楼欖榄櫬榇櫚榈櫸榉"
    "檻槛欄栏樣样檳槟櫧槠橫横檣樯櫻樱欒栾櫺棂欽钦歎叹歐欧殲歼歿殁殤殇殘残殞殒"
    "殮殓殫殚殯殡毆殴毀毁轂毂畢毕斃毙氈毡氣气氫氢氬氩氳氲匯汇漢汉汙污湯汤洶汹"
    "沍冱溝沟沒没灃沣漚沤瀝沥淪沦滄沧渢沨溈沩滬沪濘泞淚泪澩泶瀧泷瀘泸濼泺瀉泻"
    "潑泼澤泽涇泾潔洁灑洒窪洼浹浃淺浅漿浆澆浇湞浈濁浊測测澮浍濟济瀏浏滸浒渾浑"
    "滻浐濃浓澦滪濤涛澇涝淶涞瀨濑漣涟潿涠渦涡瀋沈潙沩滌涤潤润澗涧漲涨澀涩淵渊"
    "淥渌漬渍瀆渎漸渐澠渑漁渔瀋渖滲渗溫温遊游灣湾濕湿潰溃濺溅漵溆漊溇滯滞滷卤"
    "漓漓滿满濾滤濫滥灤滦濱滨灘滩澦滪瀠潆瀟潇瀲潋濰潍潛潜瀦潴瀾澜瀰弥灝灏滅灭"
    "燈灯靈灵災灾燦灿煬炀爐炉燉炖煒炜熗炝點点煉炼熾炽爍烁爛烂烴烃燭烛煙烟煩烦"
    "燒烧燁烨燴烩燙烫燼烬熱热煥焕燜焖燾焘爺爷牘牍犛牦牽牵犢犊狀状獷犷獁犸猶犹"
    "狽狈麅狍獮狝獰狞獨独狹狭獅狮獪狯猙狰獄狱猻狲獫猃獵猎獼猕玀猡豬猪貓猫蝟猬"
    "獻献獺獭璣玑璵玙瑒玚瑪玛瑋玮環环現现瑲玱璽玺瑉珉珏珏璡琎璉琏瑣琐瓊琼瑤瑶"
    "璦瑷璫珰瓔璎瓚瓒甕瓮甌瓯電电畫画暢畅佘畲疇畴癤疖療疗瘧疟癘疠瘍疡鬁疬瘡疮"
    "瘋疯皰疱痾疴癰痈痙痉癢痒癆痨瘓痪癇痫痺痹癉瘅瘮瘆瘞瘗瘺瘘癟瘪癱瘫癮瘾癬癣"
    "癲癫皚皑皺皱盤盘蓋盖盜盗眥眦矓眬著着睜睁睞睐瞼睑矚瞩矯矫磯矶礬矾礦矿碭砀"
    "碼码磚砖硨砗硯砚碸砜礪砺礱砻礫砾礎础硜硁磽硗確确鹼碱礙碍磧碛磣碜礄硚"
    "祿禄禍祸禎祯禮礼禪禅離离禿秃稈秆種种積积稱称穢秽穠秾穭穞稅税穌稣穩稳穡穑"
    "窮穷竊窃竅窍窯窑竄窜窩窝窺窥竇窦窶窭豎竖競竞篤笃筍笋筆笔筧笕箋笺籠笼籩笾"
    "築筑篳筚篩筛簹筜箏筝籌筹簽签簡简籙箓簀箦篋箧籜箨籟籁籃篮簫箫簍篓籬篱簣篑"
    "簞箪簡简糴籴類类秈籼糶粜糲粝粵粤糞粪糧粮糝糁餱糇緊紧縶絷糾纠紆纡紅红紀纪"
    "綱纲紮扎紈纨紉纫緯纬紜纭純纯紕纰紗纱綱纲納纳紝纴縱纵綸纶紛纷紙纸紋纹紡纺"
    "紵纻紖纼紐纽紓纾線线紺绀絏绁紱绂練练組组紳绅細细織织終终縐绉絆绊紼绋絀绌"
    "紹绍繹绎經经紿绐綁绑絨绒結结絝绔繞绕絰绖絎绗繪绘給给絢绚絳绛絡络絕绝絞绞"
    "統统綆绠綃绡絹绢繡绣綌绤綏绥絛绦繼继綈绨績绩緒绪綾绫緓绬續续綺绮緋绯綽绰"
    "緄绲繩绳維维綿绵綬绶繃绷綢绸綯绹綹绺綣绻綜综綻绽綰绾綠绿綴缀緇缁緙缂緗缃"
    "緘缄緬缅緻致緝缉緼缊緦缌緞缎緶缏線线緱缑縋缒緩缓締缔縷缕編编緡缗緣缘縉缙"
    "縛缚縟缛縝缜縫缝縗缞縞缟縭缡縊缢縑缣繽缤縹缥縵缦縲缧纓缨縮缩繆缪繅缫纈缬"
    "繚缭繕缮繒缯繮缰繾缱繰缲繯缳繳缴罌罂網网羅罗罰罚罷罢羆罴羈羁義义羲羲習习"
    "翹翘耮耢聳耸恥耻聶聂聾聋職职聹聍聯联聖圣聰聪肅肃腸肠膚肤骯肮腎肾腫肿脹胀"
    "脅胁膽胆勝胜朧胧腖胨臚胪脛胫膠胶脈脉膾脍臟脏臍脐腦脑膿脓臠脔腳脚脫脱腡脶"
    "臉脸臘腊醃腌膕腘齶腭膩腻靦腼膨膨臏膑臢臜輿舆艤舣艦舰艙舱艫舻艱艰豔艳艸艹"
    "藝艺節节羋芈薌芗蕪芜蘆芦蓯苁葦苇藹蔼蔑蔑蘢茏茘荔蘭兰蘿萝蟄蛰蟬蝉蠅蝇蟈蝈"
    "蠻蛮蠔蚝虜虏蟲虫雖虽蝦虾螄蛳蟯蛲蛺蛱蟶蛏蠐蛴蛻蜕蝸蜗螻蝼蠑蝾螿螀蟻蚁蠟蜡"
    "衆众術术衛卫補补錶表襯衬袞衮裝装褲裤襖袄襪袜襲袭裝装褌裈裡里製制複复褳裢"
    "褘袆褸褛襤褴見见觀观規规覓觅視视覘觇覽览覺觉覬觊覡觋覿觌覥觍覦觎親亲覯觏"
    "覲觐覷觑觸触訁讠計计訂订訃讣認认譏讥訐讦訌讧討讨讓让訕讪訖讫訓训議议訊讯"
    "記记講讲諱讳謳讴詎讵訝讶訥讷許许訛讹論论訩讻訟讼諷讽設设訪访訣诀證证詁诂"
    "訶诃評评詛诅識识詗诇詐诈訴诉診诊詆诋謅诌詞词詘诎詔诏詖诐譯译詒诒誆诓誄诔"
    "試试詿诖詩诗詰诘詼诙誠诚誅诛詵诜話话誕诞詬诟詮诠詭诡詢询詣诣諍诤該该詳详"
    "詫诧諢诨詡诩誡诫誣诬語语誚诮誤误誥诰誘诱誨诲誑诳說说誦诵誒诶請请諸诸諏诹"
    "諾诺讀读諑诼誹诽課课諉诿諛谀誰谁諗谂調调諂谄諒谅諄谆談谈誶谇誼谊謀谋諶谌"
    "諜谍謊谎諫谏諧谐謔谑謁谒謂谓諤谔諭谕諼谖諷讽諮谘諳谙謾谩謗谤謙谦謐谧謹谨"
    "謎谜謖谡謝谢謠谣謬谬譚谭譖谮譙谯讕谰譜谱譎谲讞谳譫谵讖谶貝贝貞贞負负貟贠"
    "貢贡財财責责賢贤敗败賬账貨货質质販贩貪贪貧贫貶贬購购貯贮貫贯貳贰賤贱賁贲"
    "貰贳貼贴貴贵貺贶貸贷貿贸費费賀贺貽贻賊贼贄贽賈贾賄贿貲赀賃赁賂赂贓赃資资"
    "賅赅贐赆賕赇賑赈賚赉賒赊賦赋賭赌齎赍贖赎賞赏賜赐贔屃賙赒賡赓賠赔賧赕賴赖"
    "賵赗贅赘賻赙賺赚賽赛賾赜贗赝贊赞贍赡贏赢贛赣趙赵趕赶趨趋趲趱躉趸躍跃蹌跄"
    "蹣跚躒跞跡迹踐践躂跶蹺跷蹕跸躚跹躋跻踴踊躊踌蹤踪躓踬躑踯躡蹑蹣蹒躕蹰躥蹿"
    "躪躏躦躜軀躯車车軋轧軌轨軒轩軑轪軔轫轉转軛轭輪轮軟软轟轰軲轱軻轲轤轳軸轴"
    "軹轵軼轶軤轷軫轸轢轹軺轺輕轻軾轼載载輊轾轎轿輈辀輇辁輅辂較较輒辄輔辅輛辆"
    "輦辇輩辈輝辉輥辊輞辋輟辍輜辎輳辏輻辐輯辑輸输轡辔轅辕轄辖輾辗轆辘轍辙辭辞"
    "辯辩辮辫邊边遼辽達达遷迁過过邁迈運运還还這这進进遠远違违連连遲迟邇迩逕迳"
    "跡迹適适選选遜逊遞递邐逦邏逻遺遗遙遥鄧邓鄺邝鄔邬郵邮鄒邹鄴邺鄰邻鬱郁郟郏"
    "鄶郐鄭郑鄆郓酈郦鄖郧鄲郸醞酝醱酦醬酱釅酽釃酾釀酿釋释裡里鑒鉴鑾銮鏨錾釓钆"
    "釔钇針针釘钉釗钊釙钋釕钌釷钍釺钎釧钏釤钐釣钓釩钒釹钕釵钗鈃钘鈣钙鈈钚鈦钛"
    "鈍钝鈔钞鈉钠鈐钤欽钦鈞钧鈎钩鈧钪鈁钫鈥钬鈄钭鈕钮鈀钯鈺钰錢钱鉦钲鉗钳鈷钴"
    "缽钵鈳钶鉕钷鈽钸鈸钹鉞钺鉬钼鉭钽鉀钾鈿钿鈾铀鐵铁鉑铂鈴铃鉛铅鉚铆鈰铈鉉铉"
    "鉈铊鉍铋鈹铍鐸铎鉶铏銬铐銠铑鏵铧銪铕鋁铝銅铜銱铞鏗铿銖铢銑铣銩铥鋌铤銓铨"
    "鉿铪銚铫鉺铒銫铯鉻铬銘铭錚铮銫铯鉸铰銥铱鏘锵銃铳銨铵銀银銣铷鑄铸鐒铹鋪铺"
    "鋙铻錸铼鋱铽鏈链鏜镗鏝镘鏰镚鏞镛鏡镜鏟铲鏑镝鏃镞鏇镟鏹镪鐐镣鐓镦鐘钟鐙镫"
    "鑊镬鐳镭鐺铛鐲镯鐮镰鏡镜長长門门閂闩閃闪閆闫閈闬閉闭問问闖闯閏闰闈闱閑闲"
    "閎闳間间閔闵閌闶悶闷閘闸鬧闹閨闺聞闻闥闼閩闽閭闾闔阖閥阀閣阁閡阂閫阃鬮阄"
    "閱阅閬阆闍阇閾阈閹阉閶阊鬩阋閿阌閽阍閻阎閼阏闡阐闌阑闃阒闊阔闈闱闕阙闞阚"
    "隊队陽阳陰阴陣阵階阶際际陸陆隴陇陳陈陘陉陝陕隉陧隕陨險险隨随隱隐隸隶雋隽"
    "難难雛雏讎雠靂雳霧雾霽霁黴霉靄霭靜静面面靨靥韃鞑鞽鞒韉鞯韋韦韌韧韍韨韓韩"
    "韙韪韞韫韻韵頁页頂顶頃顷頇顸項项順顺須须頊顼頑顽顧顾頓顿頎颀頒颁頌颂頏颃"
    "預预顱颅領领頗颇頸颈頡颉頰颊頲颋頜颌潁颍熲颎頦颏頤颐頻频頮颒頷颔頴颕穎颖"
    "顆颗題题顒颙顎颚顓颛顏颜額额顳颞顢颟顛颠顙颡顥颢顫颤顯显顰颦顴颧風风颺飏"
    "颭飐颮飑颯飒颶飓颸飔颼飕飀飗飄飘飆飙飛飞饗飨餍餍飢饥飣饤飥饦餳饧飩饨飪饪"
    "飫饫飭饬飯饭飲饮餞饯飾饰飽饱飼饲飿饳飴饴餌饵饒饶餉饷餄饸餎饹餃饺餅饼餑饽"
    "餓饿餒馁餐餐餛馄餡馅館馆餷馇餿馊饞馋饃馍餾馏饈馐饉馑饅馒饊馓饌馔饢馕馬马"
    "馭驭馱驮馴驯馳驰驅驱馹驲駁驳駛驶駟驷駙驸駒驹駐驻駝驼駑驽駕驾驛驿駘骀驍骁"
    "罵骂駰骃驕骄驊骅駱骆駭骇駢骈驫骉驪骊騁骋驗验騂骍駸骎騍骒騅骓驂骖騙骗騭骘"
    "騷骚騶驺騸骟騮骝騫骞騖骛驁骜騾骡驄骢驟骤驥骥驤骧髏髅髖髋髕髌鬢鬓魘魇魎魉"
    "魚鱼魛鱽魢鱾魷鱿魺鲄魯鲁魴鲂鮁鲅鮃鲆鯰鲇鮎鲇鮋鲉鮓鲊鮒鲋鮊鲌鮑鲍鮍鲏鮐鲐"
    "鮭鲑鮚鲒鮪鲔鮞鲕鮦鲖鯗鲞鮫鲛鮮鲜鮺鲊鯁鲠鱺鲡鰱鲢鰹鲣鰣鲥鰷鲦鯉鲤鰺鲹鯀鲧"
    "鯊鲨鯇鲩鯽鲫鯒鲬鯖鲭鯪鲪鯕鲯鯫鲰鯡鲱鯤鲲鯧鲳鯝鲴鯢鲵鯰鲶鯛鲷鯨鲸鯵鲹鯴鲺"
    "鯔鲻鱷鳄鰈鲽鰓鳃鰍鳅鰒鳆鰉鳇鰁鳈鰂鲗鰛鳁鰃鳂鰨鳎鰥鳏鰩鳐鰟鳑鰜鳒鰳鳓鰾鳔"
    "鱈鳕鱉鳖鰻鳗鰵鳘鰼鳛鱔鳝鱗鳞鱖鳜鱘鳇鱒鳟鱧鳢鳥鸟鳩鸠雞鸡鳶鸢鳴鸣鳲鸤鷗鸥"
    "鴉鸦鶬鸧鴇鸨鴆鸩鴣鸪鶇鸫鸕鸬鴨鸭鴞鸮鴦鸯鴒鸰鴟鸱鴝鸲鴛鸳鴬莺鴕鸵鷥鸶鷙鸷"
    "鴯鸸鴰鸹鵂鸺鴿鸽鵓鹁鸝鹂鵑鹃鵠鹄鵝鹅鵒鹆鷳鹇鵜鹈鵡鹉鵲鹊鶓鹋鵪鹌鵯鹎鵬鹏"
    "鶉鹑鶘鹕鶚鹗鶻鹘鶿鹚鶥鹛鶩鹜鷂鹞鶼鹣鶴鹤鸚鹦鷓鹧鷚鹨鷯鹩鷦鹪鷲鹫鷸鹬鷺鹭"
    "鷹鹰鸌鹱鸏鹏鹺鹾麥麦麩麸黃黄黌黉點点黶黡黷黩黲黪黽黾黿鼋鼉鼍鼴鼹齊齐齏齑"
    "齒齿齔龀齕龁齗龂齟龃齡龄齙龅齠龆齜龇齦龈齬龉齪龊齲龋齷龌龍龙龔龚龕龛龜龟"
    "臺台檯台颱台鹽盐麵面纔才薑姜餘余徵征隻只籤签捨舍衝冲"
)

_T2S_MAP = {_T2S_PAIRS[i]: _T2S_PAIRS[i + 1] for i in range(0, len(_T2S_PAIRS) - 1, 2)}
_T2S_TABLE = str.maketrans(_T2S_MAP)


def tradi2simp(line: str) -> str:
    """Traditional → simplified Chinese (compact common-char table;
    unmapped characters pass through)."""
    return line.translate(_T2S_TABLE)


# try-decode ladder, in the reference's priority order
ALL_CODECS = [
    "utf-8", "gb2312", "gbk", "utf_16", "ascii", "big5", "big5hkscs",
    "cp037", "cp273", "cp424", "cp437",
    "cp500", "cp720", "cp737", "cp775", "cp850", "cp852", "cp855", "cp856", "cp857",
    "cp858", "cp860", "cp861", "cp862", "cp863", "cp864", "cp865", "cp866", "cp869",
    "cp874", "cp875", "cp932", "cp949", "cp950", "cp1006", "cp1026", "cp1125",
    "cp1140", "cp1250", "cp1251", "cp1252", "cp1253", "cp1254", "cp1255", "cp1256",
    "cp1257", "cp1258", "euc_jp", "euc_jis_2004", "euc_jisx0213", "euc_kr",
    "gb18030", "hz", "iso2022_jp", "iso2022_jp_1", "iso2022_jp_2",
    "iso2022_jp_2004", "iso2022_jp_3", "iso2022_jp_ext", "iso2022_kr", "latin_1",
    "iso8859_2", "iso8859_3", "iso8859_4", "iso8859_5", "iso8859_6", "iso8859_7",
    "iso8859_8", "iso8859_9", "iso8859_10", "iso8859_11", "iso8859_13",
    "iso8859_14", "iso8859_15", "iso8859_16", "johab", "koi8_r", "koi8_t", "koi8_u",
    "kz1048", "mac_cyrillic", "mac_greek", "mac_iceland", "mac_latin2", "mac_roman",
    "mac_turkish", "ptcp154", "shift_jis", "shift_jis_2004", "shift_jisx0213",
    "utf_32", "utf_32_be", "utf_32_le", "utf_16_be", "utf_16_le", "utf_7",
    "windows-1250", "windows-1251",
    "windows-1252", "windows-1253", "windows-1254", "windows-1255", "windows-1256",
    "windows-1257", "windows-1258", "latin-2",
]


def find_codec(blob: bytes) -> str:
    """First codec that decodes the blob's head (then the whole blob);
    utf-8 as the final fallback."""
    for codec in ALL_CODECS:
        try:
            blob[:1024].decode(codec)
            return codec
        except Exception:  # noqa: BLE001 — decode probe
            pass
        try:
            blob.decode(codec)
            return codec
        except Exception:  # noqa: BLE001
            pass
    return "utf-8"


def get_text(blob: bytes) -> str:
    """Decode raw document bytes with the sniffed codec — the
    ``get_text``-shaped txt-ingest seam (rag/nlp/__init__.py &
    deepdoc/parser/utils.py)."""
    return blob.decode(find_codec(blob), errors="replace")
